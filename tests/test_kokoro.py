"""Kokoro end-to-end tests on a tiny random model (GGUF round-trip included)."""

import numpy as np
import pytest

from tts_tpu.convert.builder_kokoro import KokoroDims, write_kokoro_gguf
from tts_tpu.models.registry import runner_from_file
from tts_tpu.runtime.api import GenerationConfig, TTSError


@pytest.fixture(scope="module")
def tiny_runner(tmp_path_factory):
    path = tmp_path_factory.mktemp("kokoro") / "tiny_kokoro.gguf"
    write_kokoro_gguf(path, KokoroDims.tiny(), seed=0)
    return runner_from_file(str(path))


def test_loads_and_lists_voices(tiny_runner):
    assert tiny_runner.architecture == "kokoro"
    assert tiny_runner.list_voices() == ["af_heart"]


def test_generate_audio(tiny_runner):
    resp = tiny_runner.generate("hello world", GenerationConfig(voice="af_heart"))
    assert resp.sample_rate == 24000
    assert resp.audio.dtype == np.float32
    assert len(resp.audio) > 0
    assert len(resp.audio) % 600 == 0          # up_sampling_factor multiple
    assert np.isfinite(resp.audio).all()
    # duration sanity: >= 1 frame per token
    assert len(resp.audio) >= 600 * len("helo wrld")


def test_bad_voice_raises(tiny_runner):
    with pytest.raises(TTSError):
        tiny_runner.generate("hi", GenerationConfig(voice="nope"))


def test_deterministic_given_seed(tiny_runner):
    cfg = GenerationConfig(voice="af_heart", seed=7)
    a = tiny_runner.generate("hello world", cfg).audio
    b = tiny_runner.generate("hello world", cfg).audio
    np.testing.assert_array_equal(a, b)


def test_bucket_invariance(tiny_runner):
    """Same text must produce (nearly) identical audio regardless of which
    frame bucket it lands in — the masking contract."""
    model = tiny_runner.model
    tokens = [0] + [1, 2, 3, 16, 4, 5] + [0]
    audio_small = model.synthesize(tokens, "af_heart", seed=1)

    from tts_tpu.models import kokoro as K
    orig = K.FRAME_BUCKETS
    K.FRAME_BUCKETS = (512,)       # force a larger bucket than the default hit
    try:
        audio_big = model.synthesize(tokens, "af_heart", seed=1)
    finally:
        K.FRAME_BUCKETS = orig
    assert audio_small.shape == audio_big.shape
    # 2e-4 covers the cross-bucket bf16 noise; the transfer quantization
    # (TRANSFER_BITS, peak-relative) can add one quantization step on top
    # when the bf16 noise crosses a rounding boundary
    step = 2047.0 if K.TRANSFER_BITS == 12 else 32767.0
    peak = float(np.abs(audio_small).max()) + 1e-9
    np.testing.assert_allclose(audio_small, audio_big,
                               atol=2e-4 + peak / step)


def test_packed_protocol_matches_explicit_args(tiny_runner):
    """synthesize()'s single-upload protocol (tokens|T|seed int32 array, with
    the mask / voice-style row / PRNG key derived in-graph) is bit-identical
    to calling the fused graph with the five explicit host arguments."""
    import jax
    import jax.numpy as jnp

    model = tiny_runner.model
    token_ids = [0, 1, 2, 3, 16, 4, 5, 0]
    T = len(token_ids)
    seed = 11

    from tts_tpu.models import kokoro as K
    Tb = K.pick_bucket(T, K.TOKEN_BUCKETS)
    F = K.FRAME_BUCKETS[-1]

    tokens = np.zeros(Tb, np.int32); tokens[:T] = token_ids
    mask = np.zeros(Tb, np.float32); mask[:T] = 1.0
    style_gen, style_pros = model.voice_style("af_heart", T)
    explicit = np.asarray(model._fused(F)(
        model.params, jnp.asarray(tokens), jnp.asarray(mask), style_gen,
        style_pros, jax.random.PRNGKey(seed), model.window))

    arr = np.zeros(Tb + 2, np.int32)
    arr[:T] = token_ids
    arr[-2] = T
    arr[-1] = seed
    packed = np.asarray(model._fused_packed(F)(
        model.params, model._voice_pack("af_heart"), jnp.asarray(arr),
        model.window))
    np.testing.assert_array_equal(explicit, packed)


def test_empty_text(tiny_runner):
    resp = tiny_runner.generate("...", GenerationConfig(voice="af_heart"))
    assert len(resp.audio) == 0


def test_generate_stream_chunks(tiny_runner):
    from tts_tpu.runtime.api import GenerationConfig
    chunks = list(tiny_runner.generate_stream("hello. world.",
                                              GenerationConfig(voice="af_heart")))
    assert len(chunks) == 2
    for c in chunks:
        assert len(c) > 0 and np.isfinite(c).all()


def test_tokenize_chunks_long_clause(tiny_runner):
    cfg = tiny_runner.model.cfg
    # one clause far beyond the context window, with spaces for clean splits
    word = "abc "
    clause = word * 400   # 1600 tokens
    chunks = tiny_runner.tokenize_chunks([clause])
    assert len(chunks) > 1
    for c in chunks:
        assert len(c) <= cfg.max_context_length
        assert c[0] == cfg.bos_token_id and c[-1] == cfg.eos_token_id
    # no tokens lost (ignoring bos/eos and boundary spaces)
    total = sum(len(c) - 2 for c in chunks)
    assert total >= 1550


def test_tokenize_chunks_skips_empty(tiny_runner):
    assert tiny_runner.tokenize_chunks(["", "   ", "ab"]) != []
    assert len(tiny_runner.tokenize_chunks(["", "   "])) == 0


def test_aot_export_cache_roundtrip(tiny_runner, tmp_path, monkeypatch):
    """The AOT cache serializes the fused graph and a 'fresh process'
    (cleared memory cache) deserializes it and produces identical audio."""
    import os

    from tts_tpu.runtime import aot

    monkeypatch.delenv("TTS_TPU_NO_COMPILE_CACHE", raising=False)
    monkeypatch.setenv("TTS_TPU_AOT_DIR", str(tmp_path))
    model = tiny_runner.model
    model._fused_jits.clear()
    aot._MEM.clear()
    tokens = [0, 1, 2, 3, 16, 4, 5, 0]
    a = model.synthesize(tokens, "af_heart", seed=2)
    files = [f for f in os.listdir(tmp_path) if f.endswith(".jaxexport")]
    assert files, "no AOT artifact written"
    # fresh-process simulation: in-memory caches cleared -> deserialize path
    aot._MEM.clear()
    model._fused_jits.clear()
    b = model.synthesize(tokens, "af_heart", seed=2)
    np.testing.assert_array_equal(a, b)


def test_per_voice_frame_rate_no_cross_pollution(tmp_path_factory):
    """The frame-bucket predictor is per-voice (VERDICT r3 item 5): a slow
    voice's measurements must not shift a fast voice's predictions, and the
    second call per voice must reuse its own converged estimate with no
    re-dispatch (exactly ONE fused dispatch per call)."""
    path = tmp_path_factory.mktemp("kokoro2v") / "two_voice.gguf"
    write_kokoro_gguf(path, KokoroDims.tiny(), seed=0,
                      voices=("af_heart", "bm_slow"), duration_bias=-2.6)
    runner = runner_from_file(str(path))
    model = runner.model
    tokens = [0, 1, 2, 3, 16, 4, 5, 0]

    from tts_tpu.runtime import aot
    calls = []
    orig = aot.call_cached

    def counting(name, static_repr, fn, *args, **kw):
        calls.append(static_repr)
        return orig(name, static_repr, fn, *args, **kw)

    aot.call_cached = counting
    try:
        model.synthesize(tokens, "af_heart", seed=1)
        assert "af_heart" in model._frames_per_token
        assert "bm_slow" not in model._frames_per_token  # no pollution

        # seed the second voice at a very different speaking rate; the first
        # voice's estimate must be untouched by it
        before = model._frames_per_token["af_heart"]
        model.seed_frame_rate("bm_slow", 40.0)
        model.synthesize(tokens, "bm_slow", seed=1)
        assert model._frames_per_token["af_heart"] == before

        # second call per voice: converged estimate -> ONE dispatch, and the
        # bm_slow estimate evolved from ITS OWN seed (EMA from 40), not from
        # af_heart's measurement
        n0 = len(calls)
        model.synthesize(tokens, "af_heart", seed=1)
        assert len(calls) == n0 + 1, "re-dispatch on a converged voice"
        n0 = len(calls)
        model.synthesize(tokens, "bm_slow", seed=1)
        assert len(calls) == n0 + 1
        assert (model._frames_per_token["bm_slow"]
                > model._frames_per_token["af_heart"])
    finally:
        aot.call_cached = orig


def test_frozen_buckets_pin_serving_path(tiny_runner):
    """After freeze_buckets(), a predictor shift must NOT compile a new frame
    bucket (VERDICT r3 item 1a): predictions round up to the nearest pinned
    bucket; only a prediction beyond every pinned bucket falls back to the
    full ladder."""
    model = tiny_runner.model
    tokens = [0, 1, 2, 3, 16, 4, 5, 0]
    model.synthesize(tokens, "af_heart", seed=3)       # warm one bucket
    pinned = model.freeze_buckets()
    assert pinned and pinned == tuple(sorted(model._fused_packed_jits))

    # force a prediction SMALLER than any pinned bucket: selection must stay
    # inside the pinned set (no new jit), audio unchanged
    before = dict(model._frames_per_token)
    jits_before = set(model._fused_packed_jits)
    model.seed_frame_rate("af_heart", 0.5)
    a = model.synthesize(tokens, "af_heart", seed=3)
    assert set(model._fused_packed_jits) == jits_before, \
        "predictor shift compiled a new bucket despite freeze"
    model._frames_per_token.update(before)
    b = model.synthesize(tokens, "af_heart", seed=3)
    # same audio up to cross-bucket bf16 rounding (a's tiny mispredicted
    # bucket forces a re-dispatch, so a and b can come from pinned buckets
    # far apart on the ladder — looser than adjacent-bucket invariance)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=5e-3)

    # a prediction beyond every pinned bucket falls back to the full ladder
    from tts_tpu.models import kokoro as K
    saved = model._pinned_fbuckets
    model._pinned_fbuckets = (64,)
    try:
        assert model._pick_frame_bucket(100) == K.pick_bucket(100, K.FRAME_BUCKETS)
        assert model._pick_frame_bucket(60) == 64          # stays pinned
    finally:
        model._pinned_fbuckets = saved


def test_transfer_bits_12_optin(tmp_path_factory):
    """The opt-in 12-bit packed D2H transfer decodes to within one
    quantization step of the 16-bit default, and the flag is snapshotted
    per model (mutating the module global after build must not
    desynchronize trace-time packing from host unpack)."""
    from tts_tpu.models import kokoro as K

    path = tmp_path_factory.mktemp("kokoro12") / "tiny12.gguf"
    write_kokoro_gguf(path, KokoroDims.tiny(), seed=0)
    tokens = [0, 1, 2, 3, 16, 4, 5, 0]

    a16 = runner_from_file(str(path)).model.synthesize(tokens, "af_heart",
                                                       seed=3)
    orig = K.TRANSFER_BITS
    K.TRANSFER_BITS = 12
    try:
        m12 = runner_from_file(str(path)).model
    finally:
        K.TRANSFER_BITS = orig           # snapshot taken at construction
    assert m12.transfer_bits == 12
    a12 = m12.synthesize(tokens, "af_heart", seed=3)

    assert a16.shape == a12.shape
    peak = float(np.abs(a16).max()) + 1e-9
    # one 12-bit step re the peak, plus the 16-bit step both sides carry
    np.testing.assert_allclose(a12, a16, atol=peak * (1 / 2047 + 1 / 32767))


def test_synthesize_records_leg_split(tiny_runner):
    """Each synthesize call records a host/dispatch leg split for outlier
    attribution (VERDICT r4 item 3)."""
    model = tiny_runner.model
    a = model.synthesize([0, 1, 2, 3, 16, 4, 5, 0], "af_heart", seed=5)
    legs = model.last_legs
    assert legs["dispatch_d2h_ms"] > 0 and legs["payload_kb"] > 0
    assert legs["host_pre_ms"] >= 0 and legs["unpack_ms"] >= 0
    assert legs["F"] >= 1 and legs["redispatched"] in (False, True)
    assert len(a) > 0


def test_frozen_token_buckets_pin_serving_path(tmp_path_factory):
    """freeze_buckets() also pins TOKEN buckets: a post-freeze prompt whose
    natural Tb is smaller than a warmed one rounds up (no new trace), with
    audio equal up to cross-bucket reduction-order noise (padding is
    masked)."""
    from tts_tpu.models import kokoro as K

    path = tmp_path_factory.mktemp("kokorotb") / "tinytb.gguf"
    write_kokoro_gguf(path, KokoroDims.tiny(), seed=0)
    model = runner_from_file(str(path)).model
    long_tokens = list(range(2, 2 + 70))            # Tb = 128
    short_tokens = [0, 1, 2, 3, 16, 4, 5, 0]        # natural Tb = 64
    model.synthesize(long_tokens, "af_heart", seed=1)
    model.freeze_buckets()
    assert model._pinned_tbuckets == (128,)

    a = model.synthesize(short_tokens, "af_heart", seed=1)
    assert not [e for e in model.bucket_events() if isinstance(e, tuple)], \
        "short prompt traced a new token bucket despite freeze"

    m2 = runner_from_file(str(path)).model          # unpinned: natural Tb
    b = m2.synthesize(short_tokens, "af_heart", seed=1)
    # cross-bucket tolerance (as in test_bucket_invariance): reductions over
    # a different padded size reorder accumulation, and the peak-relative
    # transfer quantization can add one step on top
    assert a.shape == b.shape
    step = 2047.0 if K.TRANSFER_BITS == 12 else 32767.0
    peak = float(np.abs(a).max()) + 1e-9
    # 5e-3 as in test_frozen_buckets_pin_serving_path: the token-rate stages
    # (ALBERT, duration LSTMs, text encoder) all reduce over the padded Tb
    np.testing.assert_allclose(a, b, atol=5e-3 + peak / step)

    # beyond the pinned max falls back to the full ladder and records it
    model.synthesize(list(range(2, 2 + 140)), "af_heart", seed=1)  # Tb = 256
    assert ("Tb", 256) in model.bucket_events()
