"""Stage-level split of the Kokoro graph: duration (token rate) vs
prosody/decoder (frame rate) vs generator tail (sample rate).

Jits live in THIS file (closing over cfg/F), so the package AOT fingerprint
is untouched; each stage costs one compile, cached persistently thereafter.
Timing lives in tools/kokoro_stage_split2.py (chained-dispatch method —
block_until_ready is unreliable over the axon tunnel).
"""
import jax
import jax.numpy as jnp

from tts_tpu.models import kokoro as K


def make_pre(model, F: int):
    cfg = model.cfg

    @jax.jit
    def pre(params, tokens, mask, durations, hidden, style_gen,
            style_pros, key, window):
        # mirror of _generation_body up to the generator (same ops)
        dp, dec = params["dp"], params["decoder"]
        ends = jnp.cumsum(durations)
        starts = ends - durations
        fidx = jnp.arange(F, dtype=jnp.float32)[:, None]
        align = ((fidx >= starts[None, :]) & (fidx < ends[None, :])).astype(jnp.float32)
        total = jnp.sum(durations)
        frame_mask = (fidx[:, 0] < total).astype(jnp.float32)
        frame2_mask = K.upsample_nearest(frame_mask, 2)
        x = align @ hidden
        x = K.bilstm(x, dp["shared_lstm"]["fwd"], dp["shared_lstm"]["bwd"],
                     mask=frame_mask)
        cdtype = jnp.dtype(cfg.compute_dtype)
        f0 = x.astype(cdtype); f0_mask = frame_mask
        for blk in dp["f0_blocks"]:
            f0, f0_mask = K._ada_res_block(f0, blk, style_pros, mask=f0_mask)
        f0_curve = (f0.astype(jnp.float32) @ dp["f0_proj_w"] + dp["f0_proj_b"])
        n = x.astype(cdtype); n_mask = frame_mask
        for blk in dp["n_blocks"]:
            n, n_mask = K._ada_res_block(n, blk, style_pros, mask=n_mask)
        n_curve = (n.astype(jnp.float32) @ dp["n_proj_w"] + dp["n_proj_b"])
        te = params["text_encoder"]
        t = te["embd"][tokens]
        for conv in te["convs"]:
            t = K.conv1d(t, conv["w"], conv["b"], padding=2)
            t = K.layer_norm(t, eps=1e-5) * conv["gamma"] + conv["beta"]
            t = K.leaky_relu(t, 0.2)
            t = t * mask[:, None]
        t = K.bilstm(t, te["lstm"]["fwd"], te["lstm"]["bwd"], mask=mask)
        asr = align @ t
        f0_d = K.conv1d(f0_curve[:, None].astype(cdtype), dec["f0_conv_w"],
                        dec["f0_conv_b"], stride=2, padding=1)
        n_d = K.conv1d(n_curve[:, None].astype(cdtype), dec["n_conv_w"],
                       dec["n_conv_b"], stride=2, padding=1)
        asr16 = asr.astype(cdtype)
        cur = jnp.concatenate([asr16, f0_d, n_d], axis=-1)
        cur, cur_mask = K._ada_res_block(cur, dec["encoder_block"],
                                         style_gen, mask=frame_mask)
        asr_res = asr16 @ dec["asr_w"].astype(cdtype) + dec["asr_b"].astype(cdtype)
        for blk in dec["blocks"]:
            cat = jnp.concatenate([cur, asr_res, f0_d, n_d], axis=-1)
            cur, cur_mask = K._ada_res_block(cat, blk, style_gen, mask=cur_mask)
        source = K._sine_source(cfg, f0_curve, frame2_mask, key)
        gen = dec["generator"]
        har = jnp.tanh(source @ gen["m_source_w"] + gen["m_source_b"])[:, 0]
        mag, phase = K.stft(har, window, cfg.n_fft, cfg.hop)
        har_spec = jnp.concatenate([mag, phase], axis=-1).astype(cdtype)
        return cur, cur_mask, har_spec, total
    return pre


def make_tail(model, F: int):
    cfg = model.cfg
    S = F * cfg.up_sampling_factor

    @jax.jit
    def tail(params, cur, cur_mask, har_spec, style_gen, total, window):
        return K.generator_tail(params["decoder"]["generator"], cfg, cur,
                                cur_mask, har_spec, style_gen, total,
                                window, S)
    return tail
