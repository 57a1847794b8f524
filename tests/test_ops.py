"""Numerical tests for the ops layer against numpy/torch-semantics references."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tts_tpu.ops import (
    bilstm, conv1d, conv_transpose1d, hann_window, instance_norm_time, istft,
    layer_norm, lstm, snake, stft, upsample_linear, upsample_nearest,
    window_squared_sum,
)


def torch_conv1d_ref(x, w, b, stride=1, padding=0, dilation=1, groups=1):
    import torch
    xt = torch.from_numpy(x.T[None])
    out = torch.nn.functional.conv1d(
        xt, torch.from_numpy(w), torch.from_numpy(b) if b is not None else None,
        stride=stride, padding=padding, dilation=dilation, groups=groups)
    return out[0].numpy().T


def torch_convt1d_ref(x, w, b, stride=1, padding=0, output_padding=0, dilation=1, groups=1):
    import torch
    xt = torch.from_numpy(x.T[None])
    out = torch.nn.functional.conv_transpose1d(
        xt, torch.from_numpy(w), torch.from_numpy(b) if b is not None else None,
        stride=stride, padding=padding, output_padding=output_padding,
        dilation=dilation, groups=groups)
    return out[0].numpy().T


@pytest.mark.parametrize("stride,padding,dilation,groups", [
    (1, 0, 1, 1), (1, 2, 1, 1), (2, 1, 1, 1), (1, 4, 2, 1), (1, 1, 1, 4),
])
def test_conv1d_matches_torch(rng, stride, padding, dilation, groups):
    cin, cout, k, t = 8, 12, 5, 37
    x = rng.standard_normal((t, cin)).astype(np.float32)
    w = rng.standard_normal((cout, cin // groups, k)).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    got = np.asarray(conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                            stride=stride, padding=padding, dilation=dilation, groups=groups))
    want = torch_conv1d_ref(x, w, b, stride, padding, dilation, groups)
    np.testing.assert_allclose(got, want, atol=2e-5)


@pytest.mark.parametrize("stride,padding,output_padding,groups", [
    (1, 0, 0, 1), (2, 1, 0, 1), (10, 5, 0, 1), (2, 1, 1, 1), (2, 1, 0, 4),
    (2, 1, 1, 8),   # depthwise (groups == C): the kokoro AdaIN pool shape
])
def test_conv_transpose1d_matches_torch(rng, stride, padding, output_padding, groups):
    cin, cout, k, t = 8, (8 if groups == 8 else 12), 6, 21
    x = rng.standard_normal((t, cin)).astype(np.float32)
    w = rng.standard_normal((cin, cout // groups, k)).astype(np.float32)
    b = rng.standard_normal(cout).astype(np.float32)
    got = np.asarray(conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                                      stride=stride, padding=padding,
                                      output_padding=output_padding, groups=groups))
    want = torch_convt1d_ref(x, w, b, stride, padding, output_padding, 1, groups)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_lstm_matches_torch(rng):
    import torch
    t, cin, h = 19, 6, 10
    x = rng.standard_normal((t, cin)).astype(np.float32)
    cell = torch.nn.LSTM(cin, h, batch_first=False, bidirectional=True)
    sd = {k: v.detach().numpy() for k, v in cell.state_dict().items()}

    def pack(wih, whh, bih, bhh):
        return {"w_ih": jnp.asarray(wih.T), "w_hh": jnp.asarray(whh.T),
                "b": jnp.asarray(bih + bhh)}

    fwd = pack(sd["weight_ih_l0"], sd["weight_hh_l0"], sd["bias_ih_l0"], sd["bias_hh_l0"])
    bwd = pack(sd["weight_ih_l0_reverse"], sd["weight_hh_l0_reverse"],
               sd["bias_ih_l0_reverse"], sd["bias_hh_l0_reverse"])
    got = np.asarray(bilstm(jnp.asarray(x), fwd, bwd))
    want, _ = cell(torch.from_numpy(x)[:, None, :])
    np.testing.assert_allclose(got, want[:, 0].detach().numpy(), atol=2e-5)


def test_lstm_reverse_mask_equals_unpadded(rng):
    t, pad, cin, h = 11, 7, 4, 8
    x = rng.standard_normal((t, cin)).astype(np.float32)
    params = {
        "w_ih": jnp.asarray(rng.standard_normal((cin, 4 * h)).astype(np.float32) * 0.3),
        "w_hh": jnp.asarray(rng.standard_normal((h, 4 * h)).astype(np.float32) * 0.3),
        "b": jnp.asarray(rng.standard_normal(4 * h).astype(np.float32) * 0.1),
    }
    exact = np.asarray(lstm(jnp.asarray(x), params, reverse=True))
    xp = np.concatenate([x, np.zeros((pad, cin), np.float32)])
    mask = np.concatenate([np.ones(t, np.float32), np.zeros(pad, np.float32)])
    padded = np.asarray(lstm(jnp.asarray(xp), params, reverse=True, mask=jnp.asarray(mask)))
    np.testing.assert_allclose(padded[:t], exact, atol=1e-6)


def test_instance_norm_mask_equals_unpadded(rng):
    t, pad, c = 13, 6, 5
    x = rng.standard_normal((t, c)).astype(np.float32)
    exact = np.asarray(instance_norm_time(jnp.asarray(x)))
    xp = np.concatenate([x, np.zeros((pad, c), np.float32)])
    mask = np.concatenate([np.ones(t, np.float32), np.zeros(pad, np.float32)])
    padded = np.asarray(instance_norm_time(jnp.asarray(xp), mask=jnp.asarray(mask)))
    np.testing.assert_allclose(padded[:t], exact, atol=1e-5)
    np.testing.assert_allclose(padded[t:], 0.0, atol=0)


def test_snake():
    x = np.linspace(-3, 3, 64, dtype=np.float32)[:, None]
    alpha = np.array([0.5], np.float32)
    got = np.asarray(snake(jnp.asarray(x), jnp.asarray(alpha)))
    want = x + np.square(np.sin(0.5 * x)) / 0.5
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_stft_istft_roundtrip(rng):
    n_fft, hop = 20, 5
    t = 400
    x = rng.standard_normal(t).astype(np.float32)
    win = hann_window(n_fft)
    mag, phase = stft(jnp.asarray(x), jnp.asarray(win), n_fft, hop)
    assert mag.shape == (t // hop + 1, n_fft // 2 + 1)
    wss = window_squared_sum(win, n_fft, hop, t // hop + 1)
    y = np.asarray(istft(mag, phase, jnp.asarray(win), jnp.asarray(wss), n_fft, hop))
    assert y.shape == (t,)
    # perfect reconstruction away from edges
    np.testing.assert_allclose(y[n_fft:-n_fft], x[n_fft:-n_fft], atol=1e-3)


def test_stft_matches_scipy(rng):
    from scipy.signal import stft as sp_stft
    n_fft, hop = 20, 5
    t = 200
    x = rng.standard_normal(t).astype(np.float32)
    win = hann_window(n_fft)
    mag, _ = stft(jnp.asarray(x), jnp.asarray(win), n_fft, hop)
    _, _, Z = sp_stft(x, window=win, nperseg=n_fft, noverlap=n_fft - hop,
                      boundary="even", padded=False)
    # scipy scales by win.sum(); compare a middle frame magnitude up to scale
    frame = 10
    got = np.asarray(mag)[frame]
    want = np.abs(Z[:, frame]) * win.sum()
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_upsample_nearest():
    x = jnp.asarray(np.array([[1.0], [2.0]], np.float32))
    out = np.asarray(upsample_nearest(x, 3))
    np.testing.assert_array_equal(out[:, 0], [1, 1, 1, 2, 2, 2])


def test_upsample_linear_endpoint_behavior():
    x = jnp.asarray(np.array([[0.0], [1.0]], np.float32))
    out = np.asarray(upsample_linear(x, 4))
    assert out.shape == (8, 1)
    assert np.all(np.diff(out[:, 0]) >= 0)
    np.testing.assert_allclose(out[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[-1, 0], 1.0, atol=1e-6)
