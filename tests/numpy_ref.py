"""Independent pure-NumPy reference implementations of every model forward.

This is the correctness oracle demanded by BASELINE.md's fourth target in an
environment with no network and no buildable C++ reference: a second,
dead-simple implementation of each graph — sharing NO code with tts_tpu/ops —
checked against the jitted graphs on random weights (tests/test_parity_numpy.py).

Deliberate implementation divergence (so the two paths have different failure
modes):
  * convolutions: explicit pad + per-tap sliding-window matmul (vs lax.conv)
  * transposed convolutions: explicit scatter-add (vs lhs-dilated conv)
  * STFT: np.fft.rfft per frame (vs windowed-DFT strided convolution)
  * iSTFT: np.fft.irfft + explicit overlap-add loop (vs identity-kernel
    transposed conv)
  * LSTM: per-timestep Python loop (vs lax.scan)
  * attention: per-head loops where convenient (vs einsum)

Semantics follow the upstream reference implementations, cited per function
(e.g. /root/reference/src/models/kokoro/model.cpp:938-1242 for Kokoro).
"""

from __future__ import annotations

import numpy as np

F32 = np.float32


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def gelu_tanh(x):
    # tanh approximation — matches jax.nn.gelu(approximate=True) and ggml_gelu
    return 0.5 * x * (1.0 + np.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def silu(x):
    return x * sigmoid(x)


def softmax(x, axis=-1):
    m = np.max(x, axis=axis, keepdims=True)
    e = np.exp(x - m)
    return e / np.sum(e, axis=axis, keepdims=True)


def layer_norm(x, eps=1e-5):
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps)


def rms_norm(x, w, eps=1e-5):
    return x / np.sqrt(np.mean(np.square(x), axis=-1, keepdims=True) + eps) * w


def instance_norm_time(x, eps=1e-5, mask=None):
    """[T, C]: normalize over time per channel; masked stats for buckets."""
    if mask is None:
        mean = x.mean(axis=0, keepdims=True)
        var = x.var(axis=0, keepdims=True)
        out = (x - mean) / np.sqrt(var + eps)
    else:
        m = mask.astype(F32)[:, None]
        n = max(m.sum(), 1.0)
        mean = (x * m).sum(axis=0, keepdims=True) / n
        var = (np.square(x - mean) * m).sum(axis=0, keepdims=True) / n
        out = (x - mean) / np.sqrt(var + eps) * m
    return out.astype(F32)


def ada_instance_norm(x, gamma, beta, mask=None):
    out = instance_norm_time(x, mask=mask) * (1.0 + gamma) + beta
    if mask is not None:
        out = out * mask.astype(F32)[:, None]
    return out


def snake(x, alpha):
    return x + np.square(np.sin(x * alpha)) / alpha


def leaky_relu(x, slope=0.01):
    return np.where(x >= 0, x, x * slope)


def conv1d(x, w, b=None, stride=1, padding=0, dilation=1, groups=1):
    """x [T, Cin], w [Cout, Cin/groups, K] -> [T_out, Cout] (torch Conv1d)."""
    x = np.asarray(x, F32)
    w = np.asarray(w, F32)
    T, Cin = x.shape
    Cout, Cg, K = w.shape
    xp = np.pad(x, ((padding, padding), (0, 0)))
    eff_k = dilation * (K - 1) + 1
    T_out = (T + 2 * padding - eff_k) // stride + 1
    out = np.zeros((T_out, Cout), F32)
    og = Cout // groups
    for g in range(groups):
        xg = xp[:, g * Cg : (g + 1) * Cg]
        wg = w[g * og : (g + 1) * og]                     # [og, Cg, K]
        for j in range(K):
            seg = xg[j * dilation : j * dilation + (T_out - 1) * stride + 1 : stride]
            out[:, g * og : (g + 1) * og] += seg @ wg[:, :, j].T
    if b is not None:
        out = out + np.asarray(b, F32)
    return out


def conv_transpose1d(x, w, b=None, stride=1, padding=0, output_padding=0,
                     dilation=1, groups=1):
    """x [T, Cin], w [Cin, Cout/groups, K] -> torch ConvTranspose1d by
    explicit scatter-add."""
    x = np.asarray(x, F32)
    w = np.asarray(w, F32)
    T, Cin = x.shape
    _, Cog, K = w.shape
    Cout = Cog * groups
    full = (T - 1) * stride + dilation * (K - 1) + 1 + output_padding
    out = np.zeros((full, Cout), F32)
    Cig = Cin // groups
    for g in range(groups):
        xg = x[:, g * Cig : (g + 1) * Cig]
        wg = w[g * Cig : (g + 1) * Cig]                   # [Cig, Cog, K]
        for j in range(K):
            contrib = xg @ wg[:, :, j]                    # [T, Cog]
            out[j * dilation : j * dilation + (T - 1) * stride + 1 : stride,
                g * Cog : (g + 1) * Cog] += contrib
    out = out[padding : full - padding]
    if b is not None:
        out = out + np.asarray(b, F32)
    return out


def lstm(x, p, reverse=False, mask=None):
    """[T, Cin] -> [T, H]; per-timestep loop. p: {"w_ih","w_hh","b"}."""
    w_ih, w_hh, b = (np.asarray(p[k], F32) for k in ("w_ih", "w_hh", "b"))
    T = x.shape[0]
    H = w_hh.shape[0]
    xp = x @ w_ih + b
    h = np.zeros(H, F32)
    c = np.zeros(H, F32)
    order = range(T - 1, -1, -1) if reverse else range(T)
    ys = np.zeros((T, H), F32)
    m = np.ones(T, F32) if mask is None else np.asarray(mask, F32)
    for t in order:
        gates = xp[t] + h @ w_hh
        i, f, g, o = np.split(gates, 4)
        c_new = sigmoid(f) * c + sigmoid(i) * np.tanh(g)
        h_new = np.tanh(c_new) * sigmoid(o)
        h = m[t] * h_new + (1 - m[t]) * h
        c = m[t] * c_new + (1 - m[t]) * c
        ys[t] = h
    return ys


def bilstm(x, fwd, bwd, mask=None):
    return np.concatenate([lstm(x, fwd, mask=mask),
                           lstm(x, bwd, reverse=True, mask=mask)], axis=-1)


def upsample_nearest(x, factor, axis=0):
    return np.repeat(x, factor, axis=axis)


def upsample_linear(x, factor, axis=0):
    x = np.moveaxis(np.asarray(x, F32), axis, 0)
    t = x.shape[0]
    pos = (np.arange(t * factor) + 0.5) / factor - 0.5
    lo = np.clip(np.floor(pos).astype(np.int64), 0, t - 1)
    hi = np.clip(lo + 1, 0, t - 1)
    frac = np.clip(pos - lo, 0.0, 1.0).astype(F32)
    shape = (t * factor,) + (1,) * (x.ndim - 1)
    out = x[lo] * (1 - frac).reshape(shape) + x[hi] * frac.reshape(shape)
    return np.moveaxis(out, 0, axis)


def stft(x, window, n_fft, hop):
    """[T] -> (mag, phase) [T//hop + 1, bins] via np.fft.rfft on centered
    reflect-padded frames (torch.stft(center=True) convention)."""
    half = n_fft // 2
    xp = np.pad(np.asarray(x, F32), (half, half), mode="reflect")
    n_frames = len(x) // hop + 1
    spec = np.zeros((n_frames, n_fft // 2 + 1), np.complex128)
    for f in range(n_frames):
        frame = xp[f * hop : f * hop + n_fft] * window
        spec[f] = np.fft.rfft(frame)
    mag = np.sqrt(np.square(np.abs(spec)) + 1e-12).astype(F32)
    phase = np.angle(spec).astype(F32)
    return mag, phase


def istft(mag, phase, window, window_sq_sum, n_fft, hop):
    """(mag, phase) [F, bins] -> [(F-1)*hop] via irfft + explicit overlap-add."""
    n_frames = mag.shape[0]
    half = n_fft // 2
    out_len = (n_frames - 1) * hop
    acc = np.zeros(out_len + n_fft, np.float64)
    spec = mag.astype(np.float64) * np.exp(1j * phase.astype(np.float64))
    for f in range(n_frames):
        frame = np.fft.irfft(spec[f], n=n_fft) * window
        start = f * hop - half
        for j in range(n_fft):
            s = start + j
            if 0 <= s < out_len:
                acc[s] += frame[j]
    return (acc[:out_len] / window_sq_sum[:out_len]).astype(F32)


def window_sq_sum_device_semantics(window, n_fft, hop, S, n_frames_out):
    """NumPy mirror of models/kokoro._device_window_sq_sum: frames 0..n_frames_out
    contribute; samples beyond n_frames_out*hop normalize by 1."""
    half = n_fft // 2
    w2 = np.square(np.asarray(window, F32))
    wss = np.zeros(S, F32)
    for t in range(S):
        for j in range(n_fft):
            pos = t + half - j
            if pos % hop == 0 and 0 <= pos // hop <= n_frames_out:
                wss[t] += w2[j]
    cutoff = n_frames_out * hop
    out = np.where(np.arange(S) < cutoff, np.maximum(wss, 1e-6), 1.0)
    return out.astype(F32)


def tree_numpy(params):
    """jax pytree -> same-structure numpy tree."""
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x, F32), params)


# ---------------------------------------------------------------------------
# Kokoro (reference: kokoro/model.cpp:938-1242)
# ---------------------------------------------------------------------------

def kokoro_albert(albert, cfg, tokens, token_mask):
    T = len(tokens)
    x = (albert["token_embd"][tokens] + albert["position_embd"][:T]
         + albert["token_type"])
    x = layer_norm(x, eps=1e-12) * albert["norm_w"] + albert["norm_b"]
    x = x @ albert["embd_w"] + albert["embd_b"]
    H, hs = cfg.n_attn_heads, cfg.head_size
    bias = np.where(token_mask > 0, 0.0, -1e9).astype(F32)
    for _ in range(cfg.n_recurrence):
        for L in albert["layers"]:
            q = (x @ L["q_w"] + L["q_b"]).reshape(T, H, hs)
            k = (x @ L["k_w"] + L["k_b"]).reshape(T, H, hs)
            v = (x @ L["v_w"] + L["v_b"]).reshape(T, H, hs)
            attn = np.zeros((T, H, hs), F32)
            for h in range(H):
                logits = (q[:, h] @ k[:, h].T) / np.sqrt(hs) + bias[None, :]
                attn[:, h] = softmax(logits, axis=-1) @ v[:, h]
            x = attn.reshape(T, H * hs) @ L["o_w"] + L["o_b"] + x
            x = layer_norm(x, eps=1e-12) * L["post_attn_norm_w"] + L["post_attn_norm_b"]
            h2 = gelu_tanh(x @ L["ffn_w"] + L["ffn_b"]) @ L["ffn_out_w"] + L["ffn_out_b"]
            x = h2 + x
            x = layer_norm(x, eps=1e-12) * L["post_ffn_norm_w"] + L["post_ffn_norm_b"]
    return x


def kokoro_duration(params, cfg, tokens, token_mask, style):
    """Mirror of models/kokoro.duration_forward (pre-round sums + hidden)."""
    dp = params["dp"]
    x = kokoro_albert(params["albert"], cfg, tokens, token_mask)
    x = x @ dp["encode_w"] + dp["encode_b"]
    style_row = np.broadcast_to(style, (x.shape[0], style.shape[0]))
    x = np.concatenate([x, style_row], axis=-1)
    for layer in dp["layers"]:
        x = bilstm(x, layer["lstm"]["fwd"], layer["lstm"]["bwd"], mask=token_mask)
        gamma = style @ layer["gamma_w"] + layer["gamma_b"]
        beta = style @ layer["beta_w"] + layer["beta_b"]
        x = layer_norm(x) * (1.0 + gamma) + beta
        x = np.concatenate([x, style_row], axis=-1)
    hidden = x
    y = bilstm(x, dp["duration_lstm"]["fwd"], dp["duration_lstm"]["bwd"],
               mask=token_mask)
    y = sigmoid(y @ dp["duration_proj_w"] + dp["duration_proj_b"])
    sums = y.sum(axis=-1)
    durations = np.clip(np.round(sums), 1.0, 50.0) * token_mask
    return sums, durations, hidden


def _ada_res_block(x, blk, style, mask=None):
    gamma1 = style @ blk["norm1_gamma_w"] + blk["norm1_gamma_b"]
    beta1 = style @ blk["norm1_beta_w"] + blk["norm1_beta_b"]
    cur = ada_instance_norm(x, gamma1, beta1, mask=mask)
    cur = leaky_relu(cur, 0.2)
    out_mask = mask
    if "pool_w" in blk:
        cur = conv_transpose1d(cur, blk["pool_w"], blk["pool_b"], stride=2,
                               padding=1, output_padding=1, groups=cur.shape[1])
        out_mask = None if mask is None else upsample_nearest(mask, 2)
    cur = conv1d(cur, blk["conv1_w"], blk["conv1_b"], padding=1)
    gamma2 = style @ blk["norm2_gamma_w"] + blk["norm2_gamma_b"]
    beta2 = style @ blk["norm2_beta_w"] + blk["norm2_beta_b"]
    cur = ada_instance_norm(cur, gamma2, beta2, mask=out_mask)
    cur = leaky_relu(cur, 0.2)
    cur = conv1d(cur, blk["conv2_w"], blk["conv2_b"], padding=1)
    res = x
    if "sc_w" in blk:
        if "pool_w" in blk:
            res = upsample_nearest(res, 2, axis=0)
        res = res @ blk["sc_w"]
    return (cur + res) / np.sqrt(2.0, dtype=F32), out_mask


def _gen_res_block(x, blk, style, geom, mask=None):
    mcol = None if mask is None else mask.astype(F32)[:, None]
    inp = x
    for j in range(len(blk["convs1_w"])):
        padding, dilation = geom[j]
        gamma = style @ blk["g1_w"][j] + blk["g1_b"][j]
        beta = style @ blk["b1_w"][j] + blk["b1_b"][j]
        cur = ada_instance_norm(inp, gamma, beta, mask=mask)
        cur = snake(cur, blk["alpha1"][j])
        if mcol is not None:
            cur = cur * mcol
        cur = conv1d(cur, blk["convs1_w"][j], blk["convs1_b"][j],
                     padding=padding, dilation=dilation)
        gamma = style @ blk["g2_w"][j] + blk["g2_b"][j]
        beta = style @ blk["b2_w"][j] + blk["b2_b"][j]
        cur = ada_instance_norm(cur, gamma, beta, mask=mask)
        cur = snake(cur, blk["alpha2"][j])
        if mcol is not None:
            cur = cur * mcol
        cur = conv1d(cur, blk["convs2_w"][j], blk["convs2_b"][j], padding=geom[0][0])
        if mcol is not None:
            cur = cur * mcol
        inp = inp + cur
    return inp


def kokoro_generation(params, cfg, F, tokens, token_mask, durations, hidden,
                      style_gen, style_pros, sine_noise, window,
                      har_spec_override=None):
    """Mirror of models/kokoro.generation_forward (compute_dtype=float32).
    `sine_noise` [S, harmonics+1] replaces the on-device PRNG draw.

    `har_spec_override`: STFT phase has a branch ambiguity at exactly +/-pi
    (arctan2 of im ~ +/-0) that flips sign between any two float
    implementations; passing the other implementation's [frames, 2*bins]
    harmonic spectrum isolates the (strictly comparable) downstream graph,
    while stft() itself is compared in wrapped-phase terms by the test."""
    dp, dec = params["dp"], params["decoder"]
    S = F * cfg.up_sampling_factor

    ends = np.cumsum(durations)
    starts = ends - durations
    fidx = np.arange(F, dtype=F32)[:, None]
    align = ((fidx >= starts[None, :]) & (fidx < ends[None, :])).astype(F32)
    total = durations.sum()
    frame_mask = (fidx[:, 0] < total).astype(F32)

    x = align @ hidden
    x = bilstm(x, dp["shared_lstm"]["fwd"], dp["shared_lstm"]["bwd"],
               mask=frame_mask)

    f0 = x
    f0_mask = frame_mask
    for blk in dp["f0_blocks"]:
        f0, f0_mask = _ada_res_block(f0, blk, style_pros, mask=f0_mask)
    f0_curve = f0 @ dp["f0_proj_w"] + dp["f0_proj_b"]

    n = x
    n_mask = frame_mask
    for blk in dp["n_blocks"]:
        n, n_mask = _ada_res_block(n, blk, style_pros, mask=n_mask)
    n_curve = n @ dp["n_proj_w"] + dp["n_proj_b"]

    te = params["text_encoder"]
    t = te["embd"][tokens]
    for conv in te["convs"]:
        t = conv1d(t, conv["w"], conv["b"], padding=2)
        t = layer_norm(t) * conv["gamma"] + conv["beta"]
        t = leaky_relu(t, 0.2)
        t = t * token_mask[:, None]
    t = bilstm(t, te["lstm"]["fwd"], te["lstm"]["bwd"], mask=token_mask)
    asr = align @ t

    f0_d = conv1d(f0_curve[:, None], dec["f0_conv_w"], dec["f0_conv_b"],
                  stride=2, padding=1)
    n_d = conv1d(n_curve[:, None], dec["n_conv_w"], dec["n_conv_b"],
                 stride=2, padding=1)
    cur = np.concatenate([asr, f0_d, n_d], axis=-1)
    cur, cur_mask = _ada_res_block(cur, dec["encoder_block"], style_gen,
                                   mask=frame_mask)
    asr_res = asr @ dec["asr_w"] + dec["asr_b"]
    for blk in dec["blocks"]:
        cat = np.concatenate([cur, asr_res, f0_d, n_d], axis=-1)
        cur, cur_mask = _ada_res_block(cat, blk, style_gen, mask=cur_mask)

    # harmonic source (model.cpp:173-193 + util.cpp:139-172)
    gen = dec["generator"]
    nh = cfg.harmonic_num + 1
    harmonics = np.arange(1, nh + 1, dtype=F32) / cfg.sample_rate
    rad = (f0_curve[:, None] * harmonics[None, :]) % 1.0
    phase = np.cumsum(rad, axis=0, dtype=F32) * F32(cfg.upsample_scale * 2.0 * np.pi)
    phase = upsample_linear(phase, int(cfg.upsample_scale), axis=0)
    f0_up = upsample_nearest(f0_curve, int(cfg.upsample_scale))
    voiced = (f0_up > cfg.voice_threshold).astype(F32)[:, None]
    amp = voiced * cfg.sin_amp
    noise_amp = voiced * cfg.noise_std + (1.0 - voiced) * (cfg.sin_amp / 3.0)
    source = np.sin(phase) * amp + sine_noise * noise_amp

    har = np.tanh(source @ gen["m_source_w"] + gen["m_source_b"])[:, 0]
    if har_spec_override is not None:
        har_spec = np.asarray(har_spec_override, F32)
    else:
        mag, ph = stft(har, window, cfg.n_fft, cfg.hop)
        har_spec = np.concatenate([mag, ph], axis=-1)
    return kokoro_generator_tail(gen, cfg, cur, cur_mask, har_spec, style_gen,
                                 total, window, S)


def kokoro_generator_tail(gen, cfg, cur, cur_mask, har_spec, style_gen, total,
                          window, S):
    """Mirror of models/kokoro.generator_tail (the post-spectrum graph)."""
    x = cur * cur_mask.astype(F32)[:, None]
    n_ups = len(gen["ups"])
    valid = 2 * total
    for i in range(n_ups):
        x = leaky_relu(x, 0.1)
        x = conv_transpose1d(x, gen["ups"][i]["w"], gen["ups"][i]["b"],
                             stride=cfg.up_conv_strides[i],
                             padding=cfg.up_conv_paddings[i])
        valid = valid * cfg.up_conv_strides[i]
        if i == n_ups - 1:
            x = np.concatenate([x[1:2][::-1], x], axis=0)   # reflect front pad
            valid = valid + 1
        m = (np.arange(x.shape[0]) < valid).astype(F32)
        x = x * m[:, None]
        src = conv1d(har_spec, gen["noise_blocks"][i]["conv_w"],
                     gen["noise_blocks"][i]["conv_b"],
                     stride=cfg.noise_conv_strides[i],
                     padding=cfg.noise_conv_paddings[i])
        sm = (np.arange(src.shape[0]) < valid).astype(F32)
        src = src * sm[:, None]
        src = _gen_res_block(src, gen["noise_blocks"][i]["res"], style_gen,
                             cfg.noise_res_geom[i], mask=sm)
        x = x + src
        acc = None
        for k in range(cfg.n_kernels):
            r = _gen_res_block(x, gen["res_blocks"][i * cfg.n_kernels + k],
                               style_gen, cfg.res_block_geom[i * cfg.n_kernels + k],
                               mask=m)
            acc = r if acc is None else acc + r
        x = acc / F32(cfg.n_kernels)

    x = leaky_relu(x, 0.01)
    x = conv1d(x, gen["out_conv_w"], gen["out_conv_b"], padding=cfg.out_conv_padding)
    n_bins = cfg.n_fft // 2 + 1
    fmask = (np.arange(x.shape[0]) < valid).astype(F32)[:, None]
    spec = np.exp(x[:, :n_bins]) * fmask
    ph = np.sin(x[:, n_bins:]) * fmask
    n_samples_true = int(total * cfg.up_sampling_factor)
    wss = window_sq_sum_device_semantics(window, cfg.n_fft, cfg.hop, S,
                                         n_samples_true // cfg.hop)
    return istft(spec, ph, window, wss, cfg.n_fft, cfg.hop)


# ---------------------------------------------------------------------------
# Parler (reference: parler/model.cpp:520-693)
# ---------------------------------------------------------------------------

def parler_attention(q, k, v, mask):
    """q [T, H, hs], k/v [S, H, hs], mask broadcastable to [H, T, S]."""
    T, H, hs = q.shape
    out = np.zeros((T, H, hs), F32)
    for h in range(H):
        logits = (q[:, h] @ k[:, h].T) / np.sqrt(hs) + mask[min(h, mask.shape[0] - 1)]
        out[:, h] = softmax(logits, axis=-1) @ v[:, h]
    return out.reshape(T, H * hs)


def parler_forward(params, cfg, x, cache_k, cache_v, start_pos, q_positions,
                   cross_kv):
    """Mirror of models/parler._transformer. cache_k/v: [L, ctx, H, hs] numpy
    (mutated in place)."""
    H, hs = cfg.n_attn_heads, cfg.head_size
    T = x.shape[0]
    key_pos = np.arange(cfg.max_ctx_length)
    mask = np.where(key_pos[None, None, :] <= q_positions[None, :, None],
                    0.0, -1e9).astype(F32)
    for l, L in enumerate(params["layers"]):
        res = x
        h = layer_norm(x) * L["sa_norm_w"] + L["sa_norm_b"]
        q = (h @ L["sa_q"]).reshape(T, H, hs)
        k = (h @ L["sa_k"]).reshape(T, H, hs)
        v = (h @ L["sa_v"]).reshape(T, H, hs)
        cache_k[l, start_pos : start_pos + T] = k
        cache_v[l, start_pos : start_pos + T] = v
        attn = parler_attention(q, cache_k[l], cache_v[l], mask)
        x = res + attn @ L["sa_o"]
        if cross_kv is not None:
            res = x
            h = layer_norm(x) * L["ca_norm_w"] + L["ca_norm_b"]
            q = (h @ L["ca_q"]).reshape(T, H, hs)
            zmask = np.zeros((1, T, cross_kv["k"].shape[1]), F32)
            attn = parler_attention(q, cross_kv["k"][l], cross_kv["v"][l], zmask)
            x = res + attn @ L["ca_o"]
        res = x
        h = layer_norm(x) * L["out_norm_w"] + L["out_norm_b"]
        x = res + gelu_tanh(h @ L["fc1"]) @ L["fc2"]
    return layer_norm(x) * params["norm_w"] + params["norm_b"]


def parler_cross_kv(params, cfg):
    enc = params["text_encoding"]
    H, hs = cfg.n_attn_heads, cfg.head_size
    ks = [(enc @ L["ca_k"]).reshape(-1, H, hs) for L in params["layers"]]
    vs = [(enc @ L["ca_v"]).reshape(-1, H, hs) for L in params["layers"]]
    return {"k": np.stack(ks), "v": np.stack(vs)}


def parler_prefill_and_step(params, cfg, prompt_tokens, n_valid, audio_tokens,
                            use_cross=True):
    """Prefill the prompt then run one decode step; returns logits [9, V]."""
    cross = parler_cross_kv(params, cfg) if use_cross else None
    cache_k = np.zeros((cfg.n_layers, cfg.max_ctx_length, cfg.n_attn_heads,
                        cfg.head_size), F32)
    cache_v = np.zeros_like(cache_k)
    T = len(prompt_tokens)
    x = params["prompt_embd"][prompt_tokens] + params["positional"][:T]
    positions = np.minimum(np.arange(T), n_valid - 1)
    parler_forward(params, cfg, x, cache_k, cache_v, 0, positions, cross)

    pos = n_valid
    x = np.sum(np.stack([params["embds"][i][audio_tokens[i]]
                         for i in range(cfg.n_output_heads)]), axis=0)
    x = (x + params["positional"][pos])[None, :]
    x = parler_forward(params, cfg, x, cache_k, cache_v, pos,
                       np.asarray([pos]), cross)
    return np.stack([x[0] @ params["heads"][i]
                     for i in range(cfg.n_output_heads)])


# ---------------------------------------------------------------------------
# Dia (reference: dia/model.cpp:347-787)
# ---------------------------------------------------------------------------

def _rope_np(x, positions, theta=10000.0):
    hs = x.shape[-1]
    freqs = 1.0 / (theta ** (np.arange(0, hs, 2, dtype=F32) / hs))
    ang = positions[:, None].astype(F32) * freqs[None, :]
    cos = np.cos(ang)[..., None, :]
    sin = np.sin(ang)[..., None, :]
    x1, x2 = x[..., : hs // 2], x[..., hs // 2 :]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                          axis=-1).astype(F32)


def dia_encode(params, cfg, tokens, n_valid):
    enc = params["encoder"]
    B, T = tokens.shape
    x = enc["embedding"][tokens]
    positions = np.arange(T)
    valid = positions < n_valid
    mask = np.where(valid[:, None] == valid[None, :], 0.0, -1e9).astype(F32)
    H, hs = cfg.encoder_attn_heads, cfg.head_size
    for L in enc["layers"]:
        res = x
        h = rms_norm(x, L["sa_norm"])
        q = _rope_np((h @ L["q"]).reshape(B, T, H, hs), positions)
        k = _rope_np((h @ L["k"]).reshape(B, T, H, hs), positions)
        v = (h @ L["v"]).reshape(B, T, H, hs)
        attn = np.zeros((B, T, H, hs), F32)
        for b in range(B):
            for hh in range(H):
                logits = q[b, :, hh] @ k[b, :, hh].T + mask   # scale 1.0 (Dia)
                attn[b, :, hh] = softmax(logits, axis=-1) @ v[b, :, hh]
        x = res + attn.reshape(B, T, H * hs) @ L["o"]
        res = x
        h = rms_norm(x, L["mlp_norm"])
        x = res + (silu(h @ L["gate"]) * (h @ L["up"])) @ L["wo"]
    return rms_norm(x, enc["norm"])


def dia_step(params, cfg, enc_states, n_valid, audio_tokens, pos,
             cache_k, cache_v, history):
    """One CFG decode step at `pos` given a token history [pos, 9] already in
    the cache... here recomputed from scratch: `history` is the [pos, 9] array
    of prior input tokens; the step processes them sequentially then the
    current token, returning merged logits [9, V]."""
    dec = params["decoder"]
    T = enc_states.shape[1]
    positions_enc = np.arange(T)
    validc = (positions_enc < n_valid).astype(F32)[None, :, None, None]
    Hq, Hkv, hs = cfg.decoder_attn_heads, cfg.kv_heads, cfg.head_size
    group = Hq // Hkv
    cross_k, cross_v = [], []
    for L in dec["layers"]:
        ck = _rope_np((enc_states @ L["ca_k"]).reshape(2, T, Hq, hs),
                      positions_enc) * validc
        cv = (enc_states @ L["ca_v"]).reshape(2, T, Hq, hs)
        cross_k.append(ck)
        cross_v.append(cv)

    all_tokens = list(history) + [audio_tokens]
    merged = None
    for p, toks in enumerate(all_tokens):
        x = np.sum(np.stack([dec["embds"][i][toks[i]]
                             for i in range(cfg.n_output_heads)]), axis=0)
        x = np.broadcast_to(x, (2, 1, x.shape[-1])).astype(F32).copy()
        positions = np.asarray([p])
        for l, L in enumerate(dec["layers"]):
            res = x
            h = rms_norm(x, L["sa_norm"])
            q = _rope_np((h @ L["sa_q"]).reshape(2, 1, Hq, hs), positions)
            k = _rope_np((h @ L["sa_k"]).reshape(2, 1, Hkv, hs), positions)
            v = (h @ L["sa_v"]).reshape(2, 1, Hkv, hs)
            cache_k[l, :, p] = k[:, 0]
            cache_v[l, :, p] = v[:, 0]
            attn = np.zeros((2, Hq, hs), F32)
            for b in range(2):
                for hh in range(Hq):
                    kv_h = hh // group
                    logits = q[b, 0, hh] @ cache_k[l, b, : p + 1, kv_h].T
                    attn[b, hh] = (softmax(logits, axis=-1)
                                   @ cache_v[l, b, : p + 1, kv_h])
            x = res + attn.reshape(2, 1, Hq * hs) @ L["sa_o"]
            res = x
            h = rms_norm(x, L["ca_norm"])
            q = _rope_np((h @ L["ca_q"]).reshape(2, 1, Hq, hs), positions)
            attn = np.zeros((2, Hq, hs), F32)
            for b in range(2):
                for hh in range(Hq):
                    logits = q[b, 0, hh] @ cross_k[l][b, :, hh].T
                    attn[b, hh] = softmax(logits, axis=-1) @ cross_v[l][b, :, hh]
            x = res + attn.reshape(2, 1, Hq * hs) @ L["ca_o"]
            res = x
            h = rms_norm(x, L["mlp_norm"])
            x = res + (silu(h @ L["gate"]) * (h @ L["up"])) @ L["wo"]
        x = rms_norm(x, dec["norm"])
        logits = np.stack([x[:, 0] @ dec["heads"][i]
                           for i in range(cfg.n_output_heads)], axis=1)  # [2,9,V]
        merged = logits[0] + cfg.cfg_scale * (logits[0] - logits[1])
        ids = np.arange(cfg.output_vocab_size)
        merged = np.where(ids[None, :] > cfg.eos_token_id, -np.inf, merged)
    return merged


# ---------------------------------------------------------------------------
# Orpheus (reference: orpheus/model.cpp:230-312)
# ---------------------------------------------------------------------------

def _llama_rope_np(x, positions, rope_factors, theta):
    hs = x.shape[-1]
    freqs = 1.0 / (theta ** (np.arange(0, hs, 2, dtype=F32) / hs))
    freqs = freqs / rope_factors
    ang = positions[:, None].astype(F32) * freqs[None, :]
    cos = np.cos(ang)[:, None, :]
    sin = np.sin(ang)[:, None, :]
    x1, x2 = x[..., : hs // 2], x[..., hs // 2 :]
    return np.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin],
                          axis=-1).astype(F32)


def _lin_np(x, p):
    if "wq" in p:
        wq = np.asarray(p["wq"], F32)
        s = np.repeat(np.asarray(p["scales"], F32), 32, axis=0)
        return x @ (wq * s)
    return x @ np.asarray(p["w"], F32)


def orpheus_forward(params, cfg, tokens, positions, start_pos, cache_k, cache_v):
    """Mirror of models/orpheus._orpheus_body + head (f32 params)."""
    T = len(tokens)
    x = params["embd"][tokens].astype(F32)
    Hq, Hkv, hs = cfg.n_attn_heads, cfg.n_kv_attn_heads, cfg.head_size
    group = Hq // Hkv
    key_pos = np.arange(cfg.cache_length)
    for l, L in enumerate(params["layers"]):
        res = x
        h = rms_norm(x, L["in_norm"])
        q = _lin_np(h, L["q"]).reshape(T, Hq, hs)
        k = _lin_np(h, L["k"]).reshape(T, Hkv, hs)
        v = _lin_np(h, L["v"]).reshape(T, Hkv, hs)
        q = _llama_rope_np(q, positions, params["rope_factors"], cfg.rope_theta)
        k = _llama_rope_np(k, positions, params["rope_factors"], cfg.rope_theta)
        cache_k[l, start_pos : start_pos + T] = k
        cache_v[l, start_pos : start_pos + T] = v
        attn = np.zeros((T, Hq, hs), F32)
        for hh in range(Hq):
            kv_h = hh // group
            logits = (q[:, hh] @ cache_k[l, :, kv_h].T) / np.sqrt(hs)
            logits += np.where(key_pos[None, :] <= positions[:, None], 0.0, -1e9)
            attn[:, hh] = softmax(logits, axis=-1) @ cache_v[l, :, kv_h]
        x = res + _lin_np(attn.reshape(T, Hq * hs), L["o"])
        res = x
        h = rms_norm(x, L["post_norm"])
        h = silu(_lin_np(h, L["gate"])) * _lin_np(h, L["up"])
        x = res + _lin_np(h, L["down"])
    x = rms_norm(x, params["out_norm"])
    return _lin_np(x, params["head"])


# ---------------------------------------------------------------------------
# T5 encoder (reference: parler/t5/model.cpp:273-363)
# ---------------------------------------------------------------------------

def t5_rel_buckets(n, n_buckets=32, max_distance=128):
    half = n_buckets // 2
    max_exact = half // 2
    rel = np.arange(n)[None, :] - np.arange(n)[:, None]   # key - query (HF)
    out = np.where(rel > 0, half, 0)
    ab = np.abs(rel)
    log_big = (max_exact + (np.log(np.maximum(ab, 1) / max_exact)
                            / np.log(max_distance / max_exact) * max_exact)
               ).astype(np.int64)
    return out + np.where(ab < max_exact, ab, np.minimum(half - 1, log_big))


def t5_encode(params, cfg, tokens, token_mask):
    T = len(tokens)
    x = params["embd"][tokens]
    buckets = t5_rel_buckets(T, cfg.relative_attn_buckets, cfg.max_distance)
    pos_bias = params["rel_b"][buckets].transpose(2, 0, 1)      # [H, q, k]
    attn_bias = np.where(token_mask > 0, 0.0, -1e9).astype(F32)
    H, hs = cfg.n_attn_heads, cfg.head_size
    for L in params["layers"]:
        h = rms_norm(x, L["attn_norm"], eps=1e-6)
        q = (h @ L["q"]).reshape(T, H, hs)
        k = (h @ L["k"]).reshape(T, H, hs)
        v = (h @ L["v"]).reshape(T, H, hs)
        attn = np.zeros((T, H, hs), F32)
        for hh in range(H):
            logits = q[:, hh] @ k[:, hh].T + pos_bias[hh] + attn_bias[None, :]
            attn[:, hh] = softmax(logits, axis=-1) @ v[:, hh]
        x = x + attn.reshape(T, H * hs) @ L["o"]
        h = rms_norm(x, L["ffn_norm"], eps=1e-6)
        x = x + (gelu_tanh(h @ L["wi_0"]) * (h @ L["wi_1"])) @ L["wo"]
    x = rms_norm(x, params["out_norm"], eps=1e-6)
    if "down_proj" in params:
        x = x @ params["down_proj"] + params["down_proj_b"]
    return x


# ---------------------------------------------------------------------------
# Codecs (reference: decoder/{dac,snac}_model.cpp, general_neural_audio_codec.cpp)
# ---------------------------------------------------------------------------

def _residual_unit(x, unit, padding, dilation, groups=1):
    res = x
    cur = snake(x, unit["in_alpha"])
    cur = conv1d(cur, unit["in_w"], unit["in_b"], padding=padding,
                 dilation=dilation, groups=groups)
    cur = snake(cur, unit["out_alpha"])
    cur = conv1d(cur, unit["out_w"], unit["out_b"])
    return cur + res


def _codec_layer(x, layer, stride, padding, groups=1, noise=None):
    cur = snake(x, layer["in_alpha"])
    cur = conv_transpose1d(cur, layer["in_w"], layer["in_b"], stride=stride,
                           padding=padding)
    if noise is not None and "noise_w" in layer:
        n = conv1d(cur, layer["noise_w"])
        cur = cur + n * noise
    for i, unit in enumerate(layer["units"]):
        cur = _residual_unit(cur, unit, padding=3 ** (i + 1), dilation=3 ** i,
                             groups=groups)
    return cur


def _quantizer_decode(codes, quantizers):
    out = None
    for i, q in enumerate(quantizers):
        emb = q["codebook"][codes[:, i]]
        proj = emb @ q["out_w"] + q["out_b"]
        out = proj if out is None else out + proj
    return out


def dac_decode(params, cfg, codes, n_valid):
    mask = (np.arange(codes.shape[0]) < n_valid).astype(F32)[:, None]
    x = _quantizer_decode(codes, params["quantizers"]) * mask
    x = conv1d(x, params["in_w"], params["in_b"], padding=3)
    for i, layer in enumerate(params["layers"]):
        x = _codec_layer(x, layer, stride=cfg.strides[i], padding=cfg.paddings[i])
    x = snake(x, params["out_alpha"])
    x = conv1d(x, params["out_w"], params["out_b"], padding=3)
    return np.tanh(x)[:, 0]


def snac_decode(params, cfg, codes, n_valid, noises):
    """`noises`: list of per-layer [T_out, 1] arrays (or None) replacing the
    on-device PRNG draws."""
    T = codes.shape[0]
    mask = (np.arange(T) < n_valid).astype(F32)[:, None]
    x = _quantizer_decode(codes, params["quantizers"]) * mask
    x = conv1d(x, params["in_w"], params["in_b"], padding=3, groups=x.shape[1])
    x = conv1d(x, params["up_w"], params["up_b"])
    for i, layer in enumerate(params["layers"]):
        x = _codec_layer(x, layer, stride=cfg.strides[i], padding=cfg.paddings[i],
                         groups=cfg.groups[i], noise=noises[i])
    x = snake(x, params["out_alpha"])
    x = conv1d(x, params["out_w"], params["out_b"], padding=3)
    return np.tanh(x)[:, 0]
