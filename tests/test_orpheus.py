"""Orpheus end-to-end tests on a tiny random model."""

import numpy as np
import pytest

from tts_tpu.convert.builder_orpheus import write_orpheus_gguf
from tts_tpu.models.orpheus import (
    AUDIO_TOKEN_OFFSET, OrpheusConfig, redistribute_output_tokens,
)
from tts_tpu.models.registry import runner_from_file
from tts_tpu.runtime.api import GenerationConfig, TTSError


@pytest.fixture(scope="module")
def runner(tmp_path_factory):
    path = tmp_path_factory.mktemp("orpheus") / "tiny_orpheus.gguf"
    write_orpheus_gguf(path)
    return runner_from_file(str(path))


def test_generate(runner):
    resp = runner.generate("hi", GenerationConfig(seed=0, max_tokens=21,
                                                  voice="zoe"))
    assert resp.sample_rate == 24000
    assert np.isfinite(resp.audio).all()
    assert resp.timings["decode_steps"] >= 1


def test_bad_voice(runner):
    with pytest.raises(TTSError):
        runner.generate("hi", GenerationConfig(voice="nonexistent"))


def test_voices(runner):
    assert "zoe" in runner.list_voices()


def test_redistribute_tokens():
    cfg = OrpheusConfig()
    # one frame: head map {0,1,2,2,1,2,2}, value = tok - offset - (i%7)*4096
    frame = [AUDIO_TOKEN_OFFSET + (i % 7) * 4096 + 10 + i for i in range(7)]
    heads = redistribute_output_tokens(frame, cfg)
    np.testing.assert_array_equal(heads[0], [10])
    np.testing.assert_array_equal(heads[1], [11, 14])
    np.testing.assert_array_equal(heads[2], [12, 13, 15, 16])


def test_redistribute_drops_invalid_frames(caplog):
    """Frames with out-of-range codes are dropped whole (not clamped to 0);
    valid frames around them survive with head alignment intact."""
    cfg = OrpheusConfig()
    good = [AUDIO_TOKEN_OFFSET + (i % 7) * 4096 + 5 for i in range(7)]
    bad = list(good)
    bad[3] = 42  # a text token mid-stream -> negative after offset subtraction
    heads = redistribute_output_tokens(good + bad + good, cfg)
    np.testing.assert_array_equal(heads[0], [5, 5])
    np.testing.assert_array_equal(heads[1], [5, 5, 5, 5])
    assert len(heads[2]) == 8  # 4 per surviving frame


def test_speculative_greedy_matches_sequential(runner):
    """The self-speculative greedy loop emits exactly the sequential greedy
    loop's tokens (VERDICT r2 item 3: speculative decode, bit-identical)."""
    import jax
    import jax.numpy as jnp

    from tts_tpu.models.orpheus import (
        init_kv_cache, orpheus_decode_loop, orpheus_decode_loop_spec,
        orpheus_prefill,
    )
    from tts_tpu.ops.sampling import init_state

    cfg = runner.cfg
    ids = [128259, 128000, 72, 105, 128009, 128260, 128261, 128257]
    T = len(ids)
    tokens = np.zeros(32, np.int32)
    tokens[:T] = ids
    cache = init_kv_cache(cfg)
    logits, cache = orpheus_prefill(runner.params, cfg, jnp.asarray(tokens),
                                    jnp.asarray(T, jnp.int32), cache)
    first = jnp.argmax(logits).astype(jnp.int32)
    cache2 = jax.tree_util.tree_map(lambda x: x.copy(), cache)

    out_a, n_a, _, _, _ = orpheus_decode_loop(
        runner.params, cfg, first, jnp.asarray(T, jnp.int32),
        jnp.asarray(40, jnp.int32), cache, jax.random.PRNGKey(0),
        init_state(1), max_steps=64, do_sample=False)
    out_b, n_b, _ = orpheus_decode_loop_spec(
        runner.params, cfg, first, jnp.asarray(T, jnp.int32),
        jnp.asarray(40, jnp.int32), cache2, max_steps=64)
    n_a, n_b = int(n_a), int(n_b)
    assert n_b == n_a
    np.testing.assert_array_equal(np.asarray(out_a)[:n_a],
                                  np.asarray(out_b)[:n_b])


def test_generate_greedy_uses_spec_loop(runner):
    """runner.generate(sample=False) routes through the speculative loop and
    still produces finite audio."""
    resp = runner.generate("hello there", GenerationConfig(
        seed=0, sample=False, max_tokens=22, voice="zoe"))
    assert np.isfinite(resp.audio).all()
    assert resp.timings["decode_steps"] >= 1


def test_prompt_too_long(runner):
    with pytest.raises(TTSError):
        runner.generate("a " * 2000, GenerationConfig())


@pytest.mark.parametrize("qtype", ["Q8_0", "Q4_0", "Q5_0"])
def test_quantized_weights_stay_int8(tmp_path, qtype):
    """Q8_0/Q4_0/Q5_0 GGUF linears load as int8+scales and feed the quantized
    matmul (BASELINE north star: Q4/Q5/Q8 onto int8 TPU matmuls)."""
    import numpy as np
    from tts_tpu.core.gguf import GGMLType, GGUFFile, GGUFWriter
    from tts_tpu.models.orpheus import OrpheusConfig, load_orpheus_params

    gt = getattr(GGMLType, qtype)
    rng = np.random.default_rng(0)
    w = GGUFWriter(tmp_path / "q.gguf")
    w.add_kv("general.architecture", "orpheus")
    hidden, heads, kvh, hd, ffn = 256, 4, 2, 64, 256
    w.add_tensor("orpheus.embed_tokens", rng.standard_normal((300, hidden)).astype(np.float32))
    w.add_tensor("orpheus.lm_head", rng.standard_normal((300, hidden)).astype(np.float32), gt)
    w.add_tensor("orpheus.norm", np.ones(hidden, np.float32))
    w.add_tensor("orpheus.rope_frequencies", np.ones(hd // 2, np.float32))
    L = "orpheus.layers.0"
    w.add_tensor(f"{L}.input_layernorm", np.ones(hidden, np.float32))
    w.add_tensor(f"{L}.post_attention_layernorm", np.ones(hidden, np.float32))
    for n, shape in [("self_attn.q_proj", (heads * hd, hidden)),
                     ("self_attn.k_proj", (kvh * hd, hidden)),
                     ("self_attn.v_proj", (kvh * hd, hidden)),
                     ("self_attn.o_proj", (hidden, heads * hd)),
                     ("mlp.gate_proj", (ffn, hidden)),
                     ("mlp.up_proj", (ffn, hidden)),
                     ("mlp.down_proj", (hidden, ffn))]:
        w.add_tensor(f"{L}.{n}", rng.standard_normal(shape).astype(np.float32), gt)
    w.write()

    cfg = OrpheusConfig(n_layers=1, hidden_size=hidden, n_attn_heads=heads,
                        n_kv_attn_heads=kvh, head_size=hd, vocab_size=300)
    with GGUFFile(tmp_path / "q.gguf") as f:
        params = load_orpheus_params(dict(f.tensors), cfg)
        # Q4 packs two 4-bit values per byte ("wq4"); Q8/Q5 stay int8 ("wq");
        # uniform-format q/k/v fuse into one "qkv" Pallas launch
        qkey = "wq4" if qtype == "Q4_0" else "wq"
        qkv = params["layers"][0]["qkv"]
        assert qkey in qkv and qkv[qkey].dtype.name == "int8"
        assert qkey in params["head"]
        if qtype == "Q4_0":
            assert qkv["wq4"].shape[0] == hidden // 2
        # quantized forward runs and matches the dequantized-dense path.
        # Prefill (M > 8 -> f32 _qmm_kernel): the int8 view must introduce
        # NO extra error beyond the quantization itself.
        import jax.numpy as jnp
        from tts_tpu.ops.qmatmul import linear
        x = jnp.asarray(rng.standard_normal((16, hidden)).astype(np.float32))
        got = np.asarray(linear(x, qkv))[:, : heads * hd]   # q slice of qkv
        deq = np.asarray(x) @ f.tensors[f"{L}.self_attn.q_proj"].to_numpy().T
        np.testing.assert_allclose(got, deq, atol=1e-4, rtol=1e-4)
        # Decode (small M): the block-diagonal kernels run bf16 activations
        # (documented compute policy), so allow ~sqrt(K)*2^-9*|x||w| of input
        # rounding on top of the kernel's 2e-2 relative tolerance (the int4
        # path at this K takes the f32 _qmm4_kernel and is tighter).
        got2 = np.asarray(linear(x[:2], qkv))[:, : heads * hd]
        np.testing.assert_allclose(got2, deq[:2], atol=1e-1, rtol=2e-2)


def test_generate_stream(runner):
    """Chunked streaming equals one-shot generate exactly: the loop returns
    its evolved PRNG key (same sampled tokens) and the windowed SNAC decode
    is position-consistent with the full decode."""
    cfg = GenerationConfig(seed=0, max_tokens=42)
    chunks = list(runner.generate_stream("hi", cfg, chunk_tokens=14))
    assert len(chunks) >= 1
    total = np.concatenate(chunks)
    assert np.isfinite(total).all()
    resp = runner.generate("hi", cfg)
    assert total.shape == resp.audio.shape
    np.testing.assert_allclose(total, resp.audio, atol=2e-5, rtol=0)


def test_flash_attn_matches_einsum_decode():
    """Greedy decode through the flash-attention kernel (interpret) equals
    the einsum attention path token-for-token at kernel-eligible dims
    (head_size 128, cache padded to the DMA chunk size)."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from tts_tpu.models.orpheus import (
        OrpheusConfig, init_kv_cache, orpheus_decode_loop, orpheus_prefill,
        padded_cache_length)
    from tts_tpu.ops.sampling import init_state

    cfg = OrpheusConfig(n_layers=2, hidden_size=256, n_attn_heads=8,
                        n_kv_attn_heads=4, head_size=128, vocab_size=512,
                        max_context_length=64, max_generation_size=448,
                        stopping_token_id=511)
    assert padded_cache_length(cfg) % 512 == 0
    rng = np.random.default_rng(0)
    H = cfg.hidden_size

    def w(K, N):
        return {"w": jnp.asarray((rng.standard_normal((K, N)) * 0.05)
                                 .astype(np.float32))}

    params = {"embd": jnp.asarray(rng.standard_normal(
                  (cfg.vocab_size, H)).astype(np.float32) * 0.1),
              "head": w(H, cfg.vocab_size),
              "out_norm": jnp.ones(H, jnp.float32),
              "rope_factors": jnp.ones(cfg.head_size // 2, jnp.float32),
              "layers": []}
    for _ in range(cfg.n_layers):
        params["layers"].append({
            "in_norm": jnp.ones(H, jnp.float32),
            "q": w(H, cfg.n_attn_heads * cfg.head_size),
            "k": w(H, cfg.n_kv_attn_heads * cfg.head_size),
            "v": w(H, cfg.n_kv_attn_heads * cfg.head_size),
            "o": w(cfg.n_attn_heads * cfg.head_size, H),
            "post_norm": jnp.ones(H, jnp.float32),
            "gate": w(H, 4 * H), "up": w(H, 4 * H), "down": w(4 * H, H)})

    T = 8
    tokens = jnp.asarray(rng.integers(1, 500, T).astype(np.int32))
    outs = {}
    for flash in (True, False):
        c = dataclasses.replace(cfg, use_flash_attn=flash)
        cache = init_kv_cache(c)
        logits, cache = orpheus_prefill(params, c, tokens,
                                        jnp.asarray(T, jnp.int32), cache)
        out, n, *_ = orpheus_decode_loop(
            params, c, jnp.argmax(logits).astype(jnp.int32),
            jnp.asarray(T, jnp.int32), jnp.asarray(12, jnp.int32), cache,
            jax.random.PRNGKey(0), init_state(1), max_steps=16,
            do_sample=False)
        outs[flash] = (np.asarray(out)[: int(n)], int(n))
    assert outs[True][1] == outs[False][1] > 0
    np.testing.assert_array_equal(outs[True][0], outs[False][0])


def test_generate_stream_greedy_spec_matches_generate(runner):
    """GREEDY streaming now rides the speculative loop chunk-by-chunk
    (orpheus_decode_loop_spec_resume, VERDICT r3 item 3); the carried
    out-buffer + cache must make the stream equal one-shot generate()."""
    cfg = GenerationConfig(seed=0, max_tokens=42, sample=False)
    chunks = list(runner.generate_stream("hi", cfg, chunk_tokens=14))
    assert len(chunks) >= 1
    total = np.concatenate(chunks)
    resp = runner.generate("hi", cfg)
    assert total.shape == resp.audio.shape
    np.testing.assert_allclose(total, resp.audio, atol=2e-5, rtol=0)


def test_stream_spec_resume_matches_sequential_stream(runner, monkeypatch):
    """The chunked speculative stream emits exactly the tokens of the chunked
    SEQUENTIAL stream (greedy is greedy regardless of drafting/chunking)."""
    cfg = GenerationConfig(seed=3, max_tokens=40, sample=False)
    monkeypatch.delenv("TTS_TPU_NO_SPEC", raising=False)
    spec = list(runner.generate_stream("hi there", cfg, chunk_tokens=9))
    monkeypatch.setenv("TTS_TPU_NO_SPEC", "1")
    seq = list(runner.generate_stream("hi there", cfg, chunk_tokens=9))
    a, b = np.concatenate(spec), np.concatenate(seq)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-5, rtol=0)


def test_frozen_prompt_buckets_pin_serving_path(tmp_path):
    """After freeze_buckets(), a shorter prompt must NOT compile a new
    prompt bucket (VERDICT r4 item 4 — the AR analog of
    test_frozen_buckets_pin_serving_path): prompts round up to the nearest
    pinned bucket with identical greedy output, and only a prompt longer
    than every pinned bucket falls back to the full ladder."""
    from tts_tpu.models.orpheus import PROMPT_BUCKETS

    path = str(tmp_path / "tiny_orpheus.gguf")
    write_orpheus_gguf(path)
    cfg = GenerationConfig(sample=False, seed=0, max_tokens=21, voice="zoe")

    long_text = "the quick brown fox jumps over the lazy dog " * 2
    short_text = "hi"

    r = runner_from_file(path, cfg)
    a_long = r.generate(long_text, cfg)
    events_warm = r.bucket_events()
    assert events_warm, "warmup recorded no prompt-bucket events"
    pinned = r.freeze_buckets()
    assert pinned == tuple(sorted(set(events_warm)))

    # the short prompt's natural bucket is SMALLER than the pinned one:
    # selection must round up within the pinned set (no new bucket event)
    a_short = r.generate(short_text, cfg)
    assert r.bucket_events() == events_warm, \
        "short prompt compiled a new bucket despite freeze"

    # identical tokens/audio to an unpinned runner padding to the natural
    # (smaller) bucket: prefill masking makes the bucket invisible
    r2 = runner_from_file(path, cfg)
    b_short = r2.generate(short_text, cfg)
    assert r2.bucket_events() != events_warm  # really used a different bucket
    np.testing.assert_array_equal(a_short.audio, b_short.audio)

    # a prompt beyond every pinned bucket falls back to the full ladder
    r._pinned_pbuckets = (PROMPT_BUCKETS[0],)
    n = PROMPT_BUCKETS[0] + 1
    assert r._prompt_bucket(n, PROMPT_BUCKETS) == next(
        b for b in PROMPT_BUCKETS if n <= b)
    assert r._prompt_bucket(2, PROMPT_BUCKETS) == PROMPT_BUCKETS[0]

    del a_long
