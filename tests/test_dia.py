"""Dia end-to-end tests on a tiny random model."""

import numpy as np
import pytest

from tts_tpu.convert.builder_dia import write_dia_gguf
from tts_tpu.models.dia import DiaConfig, adjust_output_tokens, tokenize_dia_sentence
from tts_tpu.models.registry import runner_from_file
from tts_tpu.runtime.api import GenerationConfig, TTSError


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    path = tmp_path_factory.mktemp("dia") / "tiny_dia.gguf"
    write_dia_gguf(path)
    return runner_from_file(str(path))


def test_tokenize_speaker_tags():
    cfg = DiaConfig(max_encoder_context_length=64)
    toks = tokenize_dia_sentence("[S1] hi [S2] yo", cfg)
    assert toks[0] == 1
    assert 2 in toks
    assert toks[-1] == ord(".")
    # unprefixed text gets [S1]
    toks2 = tokenize_dia_sentence("hello", cfg)
    assert toks2[0] == 1


def test_tokenize_too_long():
    cfg = DiaConfig(max_encoder_context_length=16)
    with pytest.raises(TTSError):
        tokenize_dia_sentence("a" * 100, cfg)


def test_generate(runner):
    resp = runner.generate("[S1] hello there.", GenerationConfig(seed=0, max_tokens=24))
    assert resp.sample_rate == 44100
    assert np.isfinite(resp.audio).all()
    assert resp.timings["decode_steps"] > 0
    # the delay drain bounds generation
    assert resp.timings["decode_steps"] <= 24


def test_adjust_output_tokens_delay():
    cfg = DiaConfig(n_output_heads=3, max_delay=2, delay_pattern=(0, 1, 2),
                    audio_vocab_size=1000)
    out = np.arange(18).reshape(6, 3)  # steps x heads
    frames = adjust_output_tokens(out, cfg)
    # frame i head h = out[i + delay[h], h]
    np.testing.assert_array_equal(frames[0], [out[0, 0], out[1, 1], out[2, 2]])
    np.testing.assert_array_equal(frames[1], [out[1, 0], out[2, 1], out[3, 2]])


def test_max_tokens_guard(runner):
    with pytest.raises(TTSError):
        runner.generate("hi", GenerationConfig(max_tokens=5))


def test_generate_stream_matches_generate(runner):
    """Chunked CFG streaming (resumable delay-drain state + windowed DAC)
    equals the one-shot generate exactly for the same seed."""
    cfg = GenerationConfig(seed=2, max_tokens=40)
    full = runner.generate("[S1] stream me.", cfg)
    chunks = list(runner.generate_stream("[S1] stream me.", cfg, chunk_steps=11))
    stream = (np.concatenate(chunks) if chunks
              else np.zeros(0, np.float32))
    assert stream.shape == full.audio.shape
    np.testing.assert_allclose(stream, full.audio, atol=2e-5, rtol=0)


def test_quantized_dia_stays_int8(tmp_path):
    """Q4 dia: quantizable decoder linears stay packed int4/int8 on device,
    the cache switches to bf16, and generation still runs end-to-end."""
    import jax.numpy as jnp

    from tts_tpu.apps.quantize import QuantizationParams, quantize_gguf
    from tts_tpu.core.gguf import GGMLType
    from tts_tpu.models.dia import dia_params_quantized

    f32 = tmp_path / "dia_f32.gguf"
    q4 = tmp_path / "dia_q4.gguf"
    # dims chosen so decoder projections meet the kernel tile constraints
    # (out % 256 == 0, in % 32 == 0)
    write_dia_gguf(f32, dec_hidden=256, ffn=256, dec_heads=4, query_heads=2,
                   head_size=64, enc_hidden=32)
    quantize_gguf(str(f32), str(q4), QuantizationParams(GGMLType.Q4_0))

    runner = runner_from_file(str(q4))
    assert dia_params_quantized(runner.params)
    assert runner.cfg.kv_dtype == "bfloat16"
    L0 = runner.params["decoder"]["layers"][0]
    assert "wq4" in L0["sa_q"] and L0["sa_q"]["wq4"].dtype == jnp.int8
    assert L0["sa_q"]["scales"].dtype == jnp.uint16
    resp = runner.generate("[S1] hi there.", GenerationConfig(seed=0, max_tokens=20))
    assert np.isfinite(resp.audio).all()


def test_speculative_greedy_matches_sequential(runner, monkeypatch):
    """The CFG speculative greedy loop (VERDICT r4 item 5) emits rows
    BIT-IDENTICAL to the sequential loop — drain schedule and stop point
    included — for generate() and generate_stream(); force_miss too."""
    import jax
    import jax.numpy as jnp

    from tts_tpu.models import dia as D

    cfg = GenerationConfig(seed=4, sample=False, max_tokens=60)
    a_spec = runner.generate("[S1] speculative dialogue.", cfg)
    s_spec = list(runner.generate_stream("[S1] speculative dialogue.", cfg,
                                         chunk_steps=17))
    s_spec = (np.concatenate(s_spec) if s_spec else np.zeros(0, np.float32))

    monkeypatch.setenv("TTS_TPU_NO_SPEC", "1")
    a_seq = runner.generate("[S1] speculative dialogue.", cfg)
    s_seq = list(runner.generate_stream("[S1] speculative dialogue.", cfg,
                                        chunk_steps=17))
    s_seq = (np.concatenate(s_seq) if s_seq else np.zeros(0, np.float32))
    monkeypatch.delenv("TTS_TPU_NO_SPEC")

    assert a_spec.timings["decode_steps"] == a_seq.timings["decode_steps"] > 0
    np.testing.assert_array_equal(a_spec.audio, a_seq.audio)
    np.testing.assert_array_equal(s_spec, s_seq)
    np.testing.assert_allclose(s_spec, a_spec.audio, atol=2e-5, rtol=0)

    # force_miss floor: every draft rejected -> one row per verify window,
    # rows still exactly equal the sequential loop's
    dcfg = runner.cfg
    cross, cache, key, sstate = runner._encode("[S1] speculative dialogue.", cfg)
    out0 = jnp.full((dcfg.max_generation_size + D.SPEC_K + 1,
                     dcfg.n_output_heads), dcfg.pad_token_id, jnp.int32)
    out, lstate, cache = D.dia_decode_loop_spec_resume(
        runner.params, dcfg, jnp.asarray(60, jnp.int32),
        jnp.asarray(dcfg.max_generation_size, jnp.int32), cache, cross,
        D.dia_init_loop_state(dcfg), out0, k=D.SPEC_K, force_miss=True)
    n = int(lstate[2])
    assert n == a_seq.timings["decode_steps"]

    cross2, cache2, key2, sstate2 = runner._encode("[S1] speculative dialogue.", cfg)
    out_seq, n_seq, *_ = D.dia_decode_loop(
        runner.params, dcfg, jnp.asarray(60, jnp.int32),
        jnp.asarray(dcfg.max_generation_size, jnp.int32), cache2, cross2,
        key2, sstate2, D.dia_init_loop_state(dcfg), do_sample=False)
    np.testing.assert_array_equal(np.asarray(out)[:n],
                                  np.asarray(out_seq)[:int(n_seq)])
