"""Numerical parity vs the independent NumPy reference (tests/numpy_ref.py).

VERDICT r1 item 4: with no network and no buildable C++ reference, the
strongest available correctness evidence is a second, dead-simple NumPy
implementation of each model forward — sharing no code with tts_tpu/ops —
checked against the jitted graphs on random weights.  Failures here mean the
two implementations disagree about the math, which catches systematically
wrong norm orders, flipped RoPE conventions, off-by-one masks, etc.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import numpy_ref as npr


def _assert_close(got, want, rtol=2e-4, atol=2e-5, what=""):
    got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
    finite = np.isfinite(want)
    np.testing.assert_array_equal(np.isfinite(got), finite, err_msg=what)
    np.testing.assert_allclose(got[finite], want[finite], rtol=rtol, atol=atol,
                               err_msg=what)


# ---------------------------------------------------------------------------
# Kokoro
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def kokoro():
    from tts_tpu.convert.builder_kokoro import KokoroDims, build_kokoro_tensors
    from tts_tpu.models.kokoro import KokoroConfig, load_kokoro_params

    dims = KokoroDims.tiny()
    tensors, kv = build_kokoro_tensors(dims, np.random.default_rng(7))
    cfg = KokoroConfig.from_gguf_kv(kv)
    cfg = dataclasses.replace(cfg, style_half_size=dims.style // 2,
                              compute_dtype="float32")
    params = load_kokoro_params(tensors, kv, cfg)
    return cfg, params, dims


def test_kokoro_duration_parity(kokoro):
    from tts_tpu.models.kokoro import duration_forward, duration_raw

    cfg, params, dims = kokoro
    rng = np.random.default_rng(1)
    T, Tv = 48, 37                                     # padded bucket, true len
    tokens = np.zeros(T, np.int32)
    tokens[:Tv] = rng.integers(1, dims.vocab, Tv)
    mask = np.zeros(T, np.float32)
    mask[:Tv] = 1.0
    style = rng.standard_normal(dims.style // 2).astype(np.float32) * 0.1

    sums_j, hidden_j = jax.jit(duration_raw, static_argnames=("cfg",))(
        params, cfg, jnp.asarray(tokens), jnp.asarray(mask), jnp.asarray(style))
    dur_j, _ = duration_forward(params, cfg, jnp.asarray(tokens),
                                jnp.asarray(mask), jnp.asarray(style))

    pn = npr.tree_numpy(params)
    sums_n, dur_n, hidden_n = npr.kokoro_duration(pn, cfg, tokens, mask, style)

    _assert_close(sums_j, sums_n, what="duration sums")
    _assert_close(hidden_j[:Tv], hidden_n[:Tv], what="duration hidden")
    np.testing.assert_array_equal(np.asarray(dur_j), dur_n,
                                  err_msg="rounded durations")


def _kokoro_gen_inputs(kokoro, seed=2):
    from tts_tpu.models.kokoro import FRAME_BUCKETS, duration_forward, pick_bucket

    cfg, params, dims = kokoro
    rng = np.random.default_rng(seed)
    T, Tv = 24, 19
    tokens = np.zeros(T, np.int32)
    tokens[:Tv] = rng.integers(1, dims.vocab, Tv)
    mask = np.zeros(T, np.float32)
    mask[:Tv] = 1.0
    style_gen = rng.standard_normal(dims.style // 2).astype(np.float32) * 0.1
    style_pros = rng.standard_normal(dims.style // 2).astype(np.float32) * 0.1
    durations, hidden = duration_forward(params, cfg, jnp.asarray(tokens),
                                         jnp.asarray(mask), jnp.asarray(style_pros))
    dur = np.asarray(durations)
    F = pick_bucket(int(dur.sum()), FRAME_BUCKETS)
    return tokens, mask, dur, np.asarray(hidden), style_gen, style_pros, F


def test_kokoro_generation_prefix_parity(kokoro):
    """Strict parity through alignment, shared LSTM, F0/N branches, text
    encoder, and decoder blocks — everything before the harmonic spectrum."""
    from tts_tpu.models import kokoro as km
    from tts_tpu.ops.conv import conv1d as jconv1d
    from tts_tpu.ops.lstm import bilstm as jbilstm

    cfg, params, dims = kokoro
    tokens, mask, dur, hidden, style_gen, style_pros, F = _kokoro_gen_inputs(kokoro)

    @jax.jit
    def prefix(params, durations, hidden, style_gen, style_pros, tokens, mask):
        dp, dec = params["dp"], params["decoder"]
        ends = jnp.cumsum(durations)
        starts = ends - durations
        fidx = jnp.arange(F, dtype=jnp.float32)[:, None]
        align = ((fidx >= starts[None, :]) & (fidx < ends[None, :])).astype(jnp.float32)
        frame_mask = (fidx[:, 0] < jnp.sum(durations)).astype(jnp.float32)
        x = jbilstm(align @ hidden, dp["shared_lstm"]["fwd"],
                    dp["shared_lstm"]["bwd"], mask=frame_mask)
        f0, f0m = x, frame_mask
        for blk in dp["f0_blocks"]:
            f0, f0m = km._ada_res_block(f0, blk, style_pros, mask=f0m)
        f0c = f0 @ dp["f0_proj_w"] + dp["f0_proj_b"]
        n, nm = x, frame_mask
        for blk in dp["n_blocks"]:
            n, nm = km._ada_res_block(n, blk, style_pros, mask=nm)
        nc = n @ dp["n_proj_w"] + dp["n_proj_b"]
        te = params["text_encoder"]
        t = te["embd"][tokens]
        for conv in te["convs"]:
            t = jconv1d(t, conv["w"], conv["b"], padding=2)
            t = km.layer_norm(t, eps=1e-5) * conv["gamma"] + conv["beta"]
            t = km.leaky_relu(t, 0.2) * mask[:, None]
        t = jbilstm(t, te["lstm"]["fwd"], te["lstm"]["bwd"], mask=mask)
        asr = align @ t
        f0d = jconv1d(f0c[:, None], dec["f0_conv_w"], dec["f0_conv_b"],
                      stride=2, padding=1)
        nd = jconv1d(nc[:, None], dec["n_conv_w"], dec["n_conv_b"],
                     stride=2, padding=1)
        cur = jnp.concatenate([asr, f0d, nd], axis=-1)
        cur, curm = km._ada_res_block(cur, dec["encoder_block"], style_gen,
                                      mask=frame_mask)
        asr_res = asr @ dec["asr_w"] + dec["asr_b"]
        for blk in dec["blocks"]:
            cat = jnp.concatenate([cur, asr_res, f0d, nd], axis=-1)
            cur, curm = km._ada_res_block(cat, blk, style_gen, mask=curm)
        return f0c, nc, cur, curm

    f0c_j, nc_j, cur_j, curm_j = prefix(
        params, jnp.asarray(dur), jnp.asarray(hidden), jnp.asarray(style_gen),
        jnp.asarray(style_pros), jnp.asarray(tokens), jnp.asarray(mask))

    pn = npr.tree_numpy(params)
    dpn, decn = pn["dp"], pn["decoder"]
    ends = np.cumsum(dur)
    starts = ends - dur
    fidx = np.arange(F, dtype=np.float32)[:, None]
    align = ((fidx >= starts[None, :]) & (fidx < ends[None, :])).astype(np.float32)
    frame_mask = (fidx[:, 0] < dur.sum()).astype(np.float32)
    x = npr.bilstm(align @ hidden, dpn["shared_lstm"]["fwd"],
                   dpn["shared_lstm"]["bwd"], mask=frame_mask)
    f0, f0m = x, frame_mask
    for blk in dpn["f0_blocks"]:
        f0, f0m = npr._ada_res_block(f0, blk, style_pros, mask=f0m)
    f0c_n = f0 @ dpn["f0_proj_w"] + dpn["f0_proj_b"]
    n, nm = x, frame_mask
    for blk in dpn["n_blocks"]:
        n, nm = npr._ada_res_block(n, blk, style_pros, mask=nm)
    nc_n = n @ dpn["n_proj_w"] + dpn["n_proj_b"]
    ten = pn["text_encoder"]
    t = ten["embd"][tokens]
    for conv in ten["convs"]:
        t = npr.conv1d(t, conv["w"], conv["b"], padding=2)
        t = npr.layer_norm(t) * conv["gamma"] + conv["beta"]
        t = npr.leaky_relu(t, 0.2) * mask[:, None]
    t = npr.bilstm(t, ten["lstm"]["fwd"], ten["lstm"]["bwd"], mask=mask)
    asr = align @ t
    f0d = npr.conv1d(f0c_n[:, None], decn["f0_conv_w"], decn["f0_conv_b"],
                     stride=2, padding=1)
    nd = npr.conv1d(nc_n[:, None], decn["n_conv_w"], decn["n_conv_b"],
                    stride=2, padding=1)
    cur_n = np.concatenate([asr, f0d, nd], axis=-1)
    cur_n, curm_n = npr._ada_res_block(cur_n, decn["encoder_block"], style_gen,
                                       mask=frame_mask)
    asr_res = asr @ decn["asr_w"] + decn["asr_b"]
    for blk in decn["blocks"]:
        cat = np.concatenate([cur_n, asr_res, f0d, nd], axis=-1)
        cur_n, curm_n = npr._ada_res_block(cat, blk, style_gen, mask=curm_n)

    _assert_close(f0c_j, f0c_n, what="f0 curve")
    _assert_close(nc_j, nc_n, what="n curve")
    # deep chain of masked instance norms accumulates f32 rounding
    _assert_close(cur_j, cur_n, rtol=1e-3, atol=5e-4, what="decoder blocks")
    np.testing.assert_array_equal(np.asarray(curm_j), curm_n)


def test_kokoro_stft_wrapped_phase_parity(kokoro):
    """STFT magnitude strictly; phase modulo 2*pi (arctan2 has a +/-pi branch
    ambiguity at im ~ +/-0 that flips between ANY two float implementations —
    the reference's atan2 has the same property)."""
    from tts_tpu.ops.stft import hann_window, stft as jstft

    cfg, _, _ = kokoro
    rng = np.random.default_rng(31)
    x = rng.standard_normal(6000).astype(np.float32) * 0.1
    window = hann_window(cfg.n_fft)
    mag_j, ph_j = jstft(jnp.asarray(x), jnp.asarray(window), cfg.n_fft, cfg.hop)
    mag_n, ph_n = npr.stft(x, window, cfg.n_fft, cfg.hop)
    _assert_close(mag_j, mag_n, what="stft magnitude")
    wrapped = np.abs((np.asarray(ph_j) - ph_n + np.pi) % (2 * np.pi) - np.pi)
    assert wrapped.max() < 1e-3, f"stft phase (wrapped) max diff {wrapped.max()}"


def test_kokoro_generator_tail_parity(kokoro):
    """Strict parity of the post-spectrum graph (upsamples, noise blocks,
    res blocks, out conv, iSTFT) on a shared harmonic spectrum."""
    from tts_tpu.models.kokoro import generator_tail
    from tts_tpu.ops.stft import hann_window

    cfg, params, dims = kokoro
    rng = np.random.default_rng(37)
    tokens, mask, dur, hidden, style_gen, style_pros, F = _kokoro_gen_inputs(kokoro)
    total = int(dur.sum())
    S = F * cfg.up_sampling_factor
    F2 = 2 * F
    window = hann_window(cfg.n_fft)

    cur = (rng.standard_normal((F2, dims.gen_ch)) * 0.1).astype(np.float32)
    cur_mask = (np.arange(F2) < 2 * total).astype(np.float32)
    har_spec = (rng.standard_normal((S // cfg.hop + 1, cfg.n_fft + 2)) * 0.3
                ).astype(np.float32)

    tail_j = jax.jit(generator_tail, static_argnames=("cfg", "S"))(
        params["decoder"]["generator"], cfg, jnp.asarray(cur),
        jnp.asarray(cur_mask), jnp.asarray(har_spec), jnp.asarray(style_gen),
        jnp.asarray(float(total)), jnp.asarray(window), S)
    audio_j = np.asarray(tail_j)[: total * cfg.up_sampling_factor]

    genn = npr.tree_numpy(params["decoder"]["generator"])
    audio_n = npr.kokoro_generator_tail(
        genn, cfg, cur, cur_mask, har_spec, style_gen, float(total), window,
        S)[: total * cfg.up_sampling_factor]

    assert audio_j.shape == audio_n.shape
    scale = np.abs(audio_n).max() + 1e-9
    np.testing.assert_allclose(audio_j, audio_n, atol=2e-4 * scale, rtol=0,
                               err_msg="kokoro generator tail audio")
    corr = np.corrcoef(audio_j, audio_n)[0, 1]
    assert corr > 0.99999, f"kokoro tail audio decorrelated: {corr}"


# ---------------------------------------------------------------------------
# Parler
# ---------------------------------------------------------------------------

def test_parler_step_parity():
    from tts_tpu.convert.builder_parler import build_parler_tensors
    from tts_tpu.models import parler as pm

    rng = np.random.default_rng(11)
    tensors, kv = build_parler_tensors(rng)
    cfg = pm.ParlerConfig.from_gguf_kv(kv)
    params = pm.load_parler_params(tensors, cfg)

    Tv = 9
    prompt = np.zeros(16, np.int32)
    prompt[:Tv] = rng.integers(1, 100, Tv)
    audio_tokens = rng.integers(0, cfg.audio_vocab_size, cfg.n_output_heads
                                ).astype(np.int32)

    cross = jax.jit(pm.precompute_cross_kv, static_argnames=("cfg",))(params, cfg)
    cache = pm.init_kv_cache(cfg)
    cache = pm.parler_prefill(params, cfg, jnp.asarray(prompt),
                              jnp.asarray(Tv, jnp.int32), cache, cross)

    @jax.jit
    def step_logits(params, cache, cross, audio_tokens, pos):
        embds = jnp.stack(params["embds"])
        x = jnp.sum(embds[jnp.arange(cfg.n_output_heads), audio_tokens], axis=0)
        x = (x + params["positional"][pos])[None, :]
        x, _ = pm._transformer(params, cfg, x, cache, pos, pos[None], cross)
        return jnp.einsum("d,hdv->hv", x[0], jnp.stack(params["heads"]))

    logits_j = step_logits(params, cache, cross, jnp.asarray(audio_tokens),
                           jnp.asarray(Tv, jnp.int32))

    pn = npr.tree_numpy(params)
    logits_n = npr.parler_prefill_and_step(pn, cfg, prompt, Tv, audio_tokens)
    _assert_close(logits_j, logits_n, what="parler step logits")


# ---------------------------------------------------------------------------
# Dia
# ---------------------------------------------------------------------------

def test_dia_steps_parity():
    from tts_tpu.convert.builder_dia import build_dia_tensors
    from tts_tpu.models import dia as dm

    rng = np.random.default_rng(13)
    tensors, kv = build_dia_tensors(rng)
    cfg = dm.DiaConfig.from_gguf_kv(kv)
    params = dm.load_dia_params(tensors, cfg)

    ids = dm.tokenize_dia_sentence("[S1] parity check", cfg)
    tokens = np.zeros((2, cfg.max_encoder_context_length), np.int32)
    tokens[0, : len(ids)] = ids
    n_valid = len(ids)

    enc_j = dm.dia_encode(params, cfg, jnp.asarray(tokens),
                          jnp.asarray(n_valid, jnp.int32))
    pn = npr.tree_numpy(params)
    enc_n = npr.dia_encode(pn, cfg, tokens, n_valid)
    _assert_close(enc_j[:, :n_valid], enc_n[:, :n_valid], what="dia encoder")

    cross = dm.dia_cross_kv(params, cfg, enc_j, jnp.asarray(n_valid, jnp.int32))
    cache = dm.init_dia_cache(cfg)

    # three decode steps (BOS staircase) through the jitted-step body
    H = cfg.n_output_heads
    history = []
    tok = np.full(H, cfg.bos_token_id, np.int32)
    merged_j = None
    for pos in range(3):
        merged_j, cache = dm._dia_step(params, cfg, jnp.asarray(tok),
                                       jnp.asarray(pos, jnp.int32), cache, cross)
        history.append(tok.copy())
        nxt = int(np.argmax(np.asarray(merged_j)[0]))
        tok = np.where(pos + 1 > np.arange(H), nxt, cfg.bos_token_id
                       ).astype(np.int32)

    cache_k = np.zeros((cfg.n_decoder_layers, 2, cfg.max_generation_size,
                        cfg.kv_heads, cfg.head_size), np.float32)
    cache_v = np.zeros_like(cache_k)
    merged_n = npr.dia_step(pn, cfg, enc_n, n_valid, history[-1], 2,
                            cache_k, cache_v, history[:-1])
    _assert_close(merged_j, merged_n, what="dia merged logits")


# ---------------------------------------------------------------------------
# Orpheus
# ---------------------------------------------------------------------------

def test_orpheus_forward_parity():
    from tts_tpu.convert.builder_orpheus import build_orpheus_tensors
    from tts_tpu.models import orpheus as om
    from tts_tpu.ops.qmatmul import linear

    rng = np.random.default_rng(17)
    tensors, kv = build_orpheus_tensors(rng, vocab=512, hidden=48, heads=6,
                                        kv_heads=2, head_dim=16, ffn=80)
    cfg = om.OrpheusConfig.from_gguf_kv(kv)
    cfg = dataclasses.replace(cfg, vocab_size=512, max_context_length=32,
                              max_generation_size=16)
    params = om.load_orpheus_params(
        {k: v for k, v in tensors.items() if k.startswith("orpheus.")},
        cfg, dtype=jnp.float32)

    T = 12
    tokens = rng.integers(0, 512, T).astype(np.int32)
    positions = np.arange(T)
    # jitted cache is head-major [L, Hkv, S, hs] (flash-decode layout); the
    # independent NumPy path keeps position-major and the compare transposes
    cache = {"k": jnp.zeros((cfg.n_layers, cfg.n_kv_attn_heads,
                             cfg.cache_length, cfg.head_size), jnp.float32),
             "v": jnp.zeros((cfg.n_layers, cfg.n_kv_attn_heads,
                             cfg.cache_length, cfg.head_size), jnp.float32)}

    @jax.jit
    def fwd(params, tokens, positions, cache):
        x, cache = om._orpheus_body(params, cfg, tokens, positions, 0, cache)
        return linear(x.astype(jnp.float32), params["head"]), cache

    logits_j, cache_j = fwd(params, jnp.asarray(tokens), jnp.asarray(positions),
                            cache)

    pn = npr.tree_numpy(params)
    cache_k = np.zeros((cfg.n_layers, cfg.cache_length, cfg.n_kv_attn_heads,
                        cfg.head_size), np.float32)
    cache_v = np.zeros_like(cache_k)
    logits_n = npr.orpheus_forward(pn, cfg, tokens, positions, 0,
                                   cache_k, cache_v)
    _assert_close(logits_j, logits_n, what="orpheus logits")
    _assert_close(np.asarray(cache_j["k"])[:, :, :T].transpose(0, 2, 1, 3),
                  cache_k[:, :T], what="orpheus K cache")


# ---------------------------------------------------------------------------
# T5
# ---------------------------------------------------------------------------

def test_t5_parity():
    from tts_tpu.convert.builder_t5 import build_t5_tensors
    from tts_tpu.models import t5 as tm

    rng = np.random.default_rng(19)
    tensors, kv = build_t5_tensors(rng)
    cfg = tm.T5Config.from_gguf_kv(kv)
    params = tm.load_t5_params(tensors, cfg)

    Tv, T = 11, 16
    tokens = np.zeros(T, np.int32)
    tokens[:Tv] = rng.integers(1, 50, Tv)
    mask = np.zeros(T, np.float32)
    mask[:Tv] = 1.0

    out_j = tm.t5_encode(params, cfg, jnp.asarray(tokens), jnp.asarray(mask))
    pn = npr.tree_numpy(params)
    out_n = npr.t5_encode(pn, cfg, tokens, mask)
    _assert_close(out_j[:Tv], out_n[:Tv], what="t5 encoding")


# ---------------------------------------------------------------------------
# Codecs
# ---------------------------------------------------------------------------

def test_dac_parity():
    from tts_tpu.codecs.dac import DACConfig, dac_decode, load_dac_params
    from tts_tpu.convert.builder_codecs import build_dac_tensors

    rng = np.random.default_rng(23)
    tensors, kv = build_dac_tensors(rng)
    cfg = DACConfig.from_gguf_kv(kv)
    params = load_dac_params(tensors, cfg)

    Tv, T = 29, 32
    codes = np.zeros((T, cfg.n_heads), np.int32)
    codes[:Tv] = rng.integers(0, 1024, (Tv, cfg.n_heads))

    audio_j = np.asarray(dac_decode(params, cfg, jnp.asarray(codes),
                                    jnp.asarray(Tv, jnp.int32)))
    pn = npr.tree_numpy(params)
    audio_n = npr.dac_decode(pn, cfg, codes, Tv)
    n = Tv * cfg.up_sampling_factor
    _assert_close(audio_j[:n], audio_n[:n], rtol=5e-4, atol=5e-5, what="dac audio")


def test_snac_parity():
    from tts_tpu.codecs.snac import SNACConfig, load_snac_params, snac_decode
    from tts_tpu.convert.builder_codecs import build_snac_tensors

    rng = np.random.default_rng(29)
    tensors, kv = build_snac_tensors(rng)
    cfg = SNACConfig.from_gguf_kv(kv)
    params = load_snac_params(tensors, cfg)

    Tv, T = 13, 16
    codes = np.zeros((T, cfg.n_heads), np.int32)
    codes[:Tv] = rng.integers(0, 64, (Tv, cfg.n_heads))
    key = jax.random.PRNGKey(5)

    audio_j = np.asarray(snac_decode(params, cfg, jnp.asarray(codes),
                                     jnp.asarray(Tv, jnp.int32), key))

    # replicate the position-keyed noise draws the device graph makes
    from tts_tpu.codecs.snac import _position_noise
    noises = []
    t, rate = T, 1
    for i, layer in enumerate(params["layers"]):
        t = t * cfg.strides[i]
        rate = rate * cfg.strides[i]
        noises.append(np.asarray(_position_noise(key, i, 0, t))
                      if cfg.use_noise and "noise_w" in layer else None)

    pn = npr.tree_numpy(params)
    audio_n = npr.snac_decode(pn, cfg, codes, Tv, noises)
    n = Tv * cfg.up_sampling_factor
    _assert_close(audio_j[:n], audio_n[:n], rtol=5e-4, atol=5e-5, what="snac audio")
