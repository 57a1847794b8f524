"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax

from tts_tpu.convert.builder_kokoro import KokoroDims, build_kokoro_tensors
from tts_tpu.models.kokoro import KokoroConfig, load_kokoro_params
from tts_tpu.parallel.mesh import make_mesh
from tts_tpu.parallel.training import DurationTrainer


def _tiny_model():
    dims = KokoroDims.tiny()
    rng = np.random.default_rng(0)
    tensors, kv = build_kokoro_tensors(dims, rng)
    cfg = KokoroConfig.from_gguf_kv(kv)
    import dataclasses
    cfg = dataclasses.replace(cfg, style_half_size=dims.style // 2)
    params = load_kokoro_params(tensors, kv, cfg)
    return cfg, params, dims


def test_mesh_shape():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("dp", "tp")


def test_duration_train_step_runs_and_reduces_loss():
    cfg, params, dims = _tiny_model()
    mesh = make_mesh(8)
    trainer = DurationTrainer(cfg, mesh, learning_rate=1e-2)
    params, opt_state = trainer.init(params)

    B, T = 8, 64
    rng = np.random.default_rng(1)
    tokens = rng.integers(1, dims.vocab, (B, T)).astype(np.int32)
    mask = np.ones((B, T), np.float32)
    mask[:, 48:] = 0.0
    style = rng.standard_normal((B, dims.style // 2)).astype(np.float32) * 0.05
    target = np.full((B, T), 5.0, np.float32)

    losses = []
    for _ in range(3):
        params, opt_state, loss = trainer.train_step(
            params, opt_state, tokens, mask, style, target)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_param_sharding_is_applied():
    cfg, params, _ = _tiny_model()
    mesh = make_mesh(8)
    from tts_tpu.parallel.training import shard_params
    placed, specs = shard_params(params, mesh)
    q_w = placed["albert"]["layers"][0]["q_w"]
    # tp axis = 2 -> each shard holds half the output features
    shard_shapes = {s.data.shape for s in q_w.addressable_shards}
    assert (q_w.shape[0], q_w.shape[1] // 2) in shard_shapes


def test_orpheus_tensor_parallel_forward():
    """Shard tiny-Orpheus over (dp, tp) and run a prefill under the mesh."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding

    from tts_tpu.convert.builder_orpheus import build_orpheus_tensors
    from tts_tpu.models.orpheus import (
        OrpheusConfig, init_kv_cache, load_orpheus_params, orpheus_param_specs,
        orpheus_prefill,
    )

    rng = np.random.default_rng(0)
    tensors, kv = build_orpheus_tensors(rng, vocab=1024, hidden=64, heads=4,
                                        kv_heads=2, head_dim=16)
    cfg = OrpheusConfig.from_gguf_kv(kv)
    import dataclasses
    cfg = dataclasses.replace(cfg, vocab_size=1024, max_context_length=64,
                              max_generation_size=32)
    params = load_orpheus_params({k: v for k, v in tensors.items()
                                  if k.startswith("orpheus.")}, cfg)
    mesh = make_mesh(8)
    specs = orpheus_param_specs(params)
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_s = treedef.flatten_up_to(specs)
    params = jax.tree_util.tree_unflatten(
        treedef, [jax.device_put(x, NamedSharding(mesh, s))
                  for x, s in zip(flat_p, flat_s)])

    cache = init_kv_cache(cfg)
    tokens = jnp.asarray(rng.integers(0, 1024, 32).astype(np.int32))
    logits, cache = orpheus_prefill(params, cfg, tokens,
                                    jnp.asarray(32, jnp.int32), cache)
    assert np.isfinite(np.asarray(logits)).all()
    assert logits.shape == (1024,)


def test_orpheus_tp_e2e_matches_unsharded(tmp_path):
    """Full sharded generation through the runner path: same greedy tokens
    (hence bitwise-same audio) as the unsharded runner. VERDICT r1 item 5."""
    import jax
    from jax.sharding import Mesh

    from tts_tpu.convert.builder_orpheus import write_orpheus_gguf
    from tts_tpu.models.registry import runner_from_file
    from tts_tpu.runtime.api import GenerationConfig

    path = str(tmp_path / "orpheus.gguf")
    write_orpheus_gguf(path, seed=0)
    cfg = GenerationConfig(sample=False, seed=0, max_tokens=24, voice="zoe")

    r0 = runner_from_file(path, cfg)
    a0 = r0.generate("hello world", cfg)

    mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("tp",))
    r1 = runner_from_file(path, cfg, mesh=mesh)
    assert r1.mesh is mesh
    # params actually sharded: a q projection has 'tp' in its sharding spec
    qp = r1.params["layers"][0]["q"]
    leaf = qp.get("w", qp.get("wq"))
    assert "tp" in str(leaf.sharding.spec)
    a1 = r1.generate("hello world", cfg)

    assert len(a0.audio) == len(a1.audio) > 0
    np.testing.assert_allclose(a0.audio, a1.audio, atol=1e-5)


def test_orpheus_tp_speculative_decode_matches_sequential(tmp_path, monkeypatch):
    """Speculative greedy decode runs UNDER TP (VERDICT r4 item 2): the same
    sharded runner produces bit-identical tokens/audio on the speculative
    path and the TTS_TPU_NO_SPEC sequential path, and both equal the
    unsharded runner — generate() and generate_stream() alike."""
    import jax
    from jax.sharding import Mesh

    from tts_tpu.convert.builder_orpheus import write_orpheus_gguf
    from tts_tpu.models.registry import runner_from_file
    from tts_tpu.runtime.api import GenerationConfig

    path = str(tmp_path / "orpheus.gguf")
    write_orpheus_gguf(path, seed=0)
    cfg = GenerationConfig(sample=False, seed=0, max_tokens=30, voice="zoe")

    r0 = runner_from_file(path, cfg)          # unsharded (speculative)
    a0 = r0.generate("hello world", cfg)

    mesh = Mesh(np.array(jax.devices()[:2]), axis_names=("tp",))
    r1 = runner_from_file(path, cfg, mesh=mesh)
    a_spec = r1.generate("hello world", cfg)
    s_spec = np.concatenate(list(r1.generate_stream("hello world", cfg)))

    monkeypatch.setenv("TTS_TPU_NO_SPEC", "1")
    a_seq = r1.generate("hello world", cfg)

    assert len(a0.audio) == len(a_spec.audio) == len(a_seq.audio) > 0
    np.testing.assert_array_equal(a_spec.audio, a_seq.audio)
    np.testing.assert_array_equal(a_spec.audio, s_spec)
    np.testing.assert_allclose(a0.audio, a_spec.audio, atol=1e-5)


@pytest.mark.parametrize("tp", [2, 4])
def test_orpheus_tp_shards_quantized_weights(tmp_path, tp):
    """TP of the realistic (quantized) deployment: a Q8-packed Orpheus with
    head_size 128 (the flash gate is LIVE) shards its wq/scales across the
    'tp' axis via shard_map — greedy tokens equal the unsharded runner's.
    VERDICT r2 item 2 + ADVICE r2 (flash-gate coverage under TP)."""
    import jax
    from jax.sharding import Mesh

    from tts_tpu.apps.quantize import main as quantize_main
    from tts_tpu.convert.builder_orpheus import write_orpheus_gguf
    from tts_tpu.models.registry import runner_from_file
    from tts_tpu.runtime.api import GenerationConfig

    f32 = str(tmp_path / "orpheus_f32.gguf")
    q8 = str(tmp_path / "orpheus_q8.gguf")
    write_orpheus_gguf(f32, seed=0, hidden=128, heads=4, kv_heads=4,
                       head_dim=128, ffn=256)
    assert quantize_main(["--model-path", f32, "--quantized-model-path", q8,
                          "--quantized-type", "Q8_0",
                          "--quantize-output-heads"]) == 0
    cfg = GenerationConfig(sample=False, seed=0, max_tokens=24, voice="zoe")

    r0 = runner_from_file(q8, cfg)
    assert "wq" in r0.params["layers"][0]["qkv"]   # quantized load
    a0 = r0.generate("hello world", cfg)

    mesh = Mesh(np.array(jax.devices()[:tp]), axis_names=("tp",))
    r1 = runner_from_file(q8, cfg, mesh=mesh)
    assert r1.cfg.tp == tp
    # flash survives TP only with >=2 local KV heads (4 kv heads: tp=2 yes)
    assert r1.cfg.use_flash_attn == (tp == 2)
    # quantized weights actually sharded, not replicated
    q_wq = r1.params["layers"][0]["q"]["wq"]
    assert "tp" in str(q_wq.sharding.spec)
    shard_shapes = {s.data.shape for s in q_wq.addressable_shards}
    assert (q_wq.shape[0], q_wq.shape[1] // tp) in shard_shapes
    sc = r1.params["layers"][0]["q"]["scales"]
    assert "tp" in str(sc.sharding.spec)
    # row-parallel: o/down shard the input dim
    o_wq = r1.params["layers"][0]["o"]["wq"]
    o_shapes = {s.data.shape for s in o_wq.addressable_shards}
    assert (o_wq.shape[0] // tp, o_wq.shape[1]) in o_shapes
    a1 = r1.generate("hello world", cfg)
    assert len(a0.audio) == len(a1.audio) > 0
    np.testing.assert_allclose(a0.audio, a1.audio, atol=1e-5)


def test_orpheus_tp_uneven_heads_falls_back(tmp_path):
    """KV heads that do NOT divide tp (2 kv heads, tp=4): make_tp_context
    must keep the KV cache replicated and gate off flash/int8-KV, while
    still sharding the (divisible) quantized linears — and generation must
    still equal the unsharded runner (VERDICT r2 weak 3: divisibility
    fallback coverage)."""
    import jax
    from jax.sharding import Mesh

    from tts_tpu.apps.quantize import main as quantize_main
    from tts_tpu.convert.builder_orpheus import write_orpheus_gguf
    from tts_tpu.models.registry import runner_from_file
    from tts_tpu.runtime.api import GenerationConfig

    f32 = str(tmp_path / "orpheus_f32.gguf")
    q8 = str(tmp_path / "orpheus_q8.gguf")
    write_orpheus_gguf(f32, seed=0, hidden=128, heads=4, kv_heads=2,
                       head_dim=128, ffn=256)
    assert quantize_main(["--model-path", f32, "--quantized-model-path", q8,
                          "--quantized-type", "Q8_0",
                          "--quantize-output-heads"]) == 0
    cfg = GenerationConfig(sample=False, seed=0, max_tokens=24, voice="zoe")

    r0 = runner_from_file(q8, cfg)
    a0 = r0.generate("hello world", cfg)

    mesh = Mesh(np.array(jax.devices()[:4]), axis_names=("tp",))
    r1 = runner_from_file(q8, cfg, mesh=mesh)
    # quantized linears still shard (all N/K splits divide) ...
    assert r1.cfg.tp == 4
    q_wq = r1.params["layers"][0]["q"]["wq"]
    assert "tp" in str(q_wq.sharding.spec)
    # ... but the head axes don't split: cache replicated, flash/int8-KV off
    assert not r1.cfg.use_flash_attn and not r1.cfg.kv_quant
    k_cache = r1._cache["k"] if r1._cache else None
    if k_cache is not None:
        assert "tp" not in str(k_cache.sharding.spec)
    a1 = r1.generate("hello world", cfg)
    assert len(a0.audio) == len(a1.audio) > 0
    np.testing.assert_allclose(a0.audio, a1.audio, atol=1e-5)


def test_mesh_rejected_for_non_tp_architecture():
    from tts_tpu.models.registry import runner_from_file
    from tts_tpu.runtime.api import TTSError

    mesh = make_mesh(8)
    with pytest.raises(TTSError):
        runner_from_file("test:dummy", mesh=mesh)


def test_dryrun_multichip_self_provisions():
    """Driver contract: dryrun_multichip(8) must succeed in a fresh process
    with NO XLA_FLAGS preset and only 1 visible device (MULTICHIP_r01 failed
    exactly this way under the axon platform pin)."""
    import subprocess
    import sys

    env = dict(**{k: v for k, v in __import__("os").environ.items()
                  if k != "XLA_FLAGS"})
    out = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=900)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip OK" in out.stdout
    assert "dryrun TP decode OK" in out.stdout


def test_data_parallel_replica_placement(tmp_path):
    """--data-parallel commits one replica per chip and replicas produce the
    same audio (SURVEY §2.9(c): dp request serving replaces --n-parallelism)."""
    import jax

    from tts_tpu.convert.builder_kokoro import KokoroDims, write_kokoro_gguf
    from tts_tpu.parallel.serving import load_replica
    from tts_tpu.runtime.api import GenerationConfig

    path = str(tmp_path / "k.gguf")
    write_kokoro_gguf(path, KokoroDims.tiny(), seed=0)
    cfg = GenerationConfig(voice="af_heart", seed=0)
    r0 = load_replica(path, cfg, jax.devices()[0])
    r1 = load_replica(path, cfg, jax.devices()[1])
    # weights committed to distinct chips
    d0 = r0.model.params["albert"]["token_embd"].devices()
    d1 = r1.model.params["albert"]["token_embd"].devices()
    assert d0 == {jax.devices()[0]} and d1 == {jax.devices()[1]}
    a0 = r0.generate("hello world", cfg)
    a1 = r1.generate("hello world", cfg)
    np.testing.assert_array_equal(a0.audio, a1.audio)
    assert len(a0.audio) > 0


def test_move_to_device_rejects_undeclared_arrays(tmp_path):
    """move_to_device walks DECLARED device attrs only — and raises loudly if
    a runner grows an undeclared attribute holding jax arrays (anti-rot)."""
    import jax
    import jax.numpy as jnp
    import pytest

    from tts_tpu.convert.builder_kokoro import KokoroDims, write_kokoro_gguf
    from tts_tpu.models.registry import runner_from_file
    from tts_tpu.parallel.serving import move_to_device
    from tts_tpu.runtime.api import GenerationConfig

    path = str(tmp_path / "k.gguf")
    write_kokoro_gguf(path, KokoroDims.tiny(), seed=0)
    runner = runner_from_file(path, GenerationConfig(voice="af_heart"))
    move_to_device(runner, jax.devices()[1])
    assert runner.model.params["albert"]["token_embd"].devices() == {jax.devices()[1]}
    assert runner.model.window.devices() == {jax.devices()[1]}
    runner.surprise = {"w": jnp.zeros(3)}   # undeclared device state
    with pytest.raises(RuntimeError, match="surprise"):
        move_to_device(runner, jax.devices()[0])


def test_server_data_parallel_routing(tmp_path):
    """ServerState(data_parallel=True) loads one replica per (model, chip)
    and serves requests from replicas on different devices."""
    import jax

    from tts_tpu.apps.server import ServerState
    from tts_tpu.convert.builder_kokoro import KokoroDims, write_kokoro_gguf
    from tts_tpu.runtime.api import GenerationConfig

    path = str(tmp_path / "k.gguf")
    write_kokoro_gguf(path, KokoroDims.tiny(), seed=0)
    state = ServerState({"k": path}, GenerationConfig(voice="af_heart", seed=0),
                        n_parallelism=2, data_parallel=True)
    results = [state.submit({"kind": "tts", "model": "k", "prompt": "hi there",
                             "config": GenerationConfig(voice="af_heart", seed=0)})
               for _ in range(4)]
    assert all(r["success"] for r in results)
    lens = {len(r["audio"]) for r in results}
    assert len(lens) == 1 and lens.pop() > 0
    # replicas were placed on at least 2 distinct devices
    devs = set()
    for key, runner in state._runners.items():
        assert isinstance(key, tuple)
        devs |= runner.model.params["albert"]["token_embd"].devices()
    assert len(devs) >= 2


def test_server_dp_tp_composed(tmp_path):
    """DP x TP: ServerState(data_parallel=True, tensor_parallel=2) places
    replicas on DISJOINT 2-chip tp meshes and serves identical audio from
    each — SURVEY §2.9(b)+(c) composed in one deployment."""
    from tts_tpu.apps.server import ServerState
    from tts_tpu.convert.builder_orpheus import write_orpheus_gguf
    from tts_tpu.runtime.api import GenerationConfig

    path = str(tmp_path / "o.gguf")
    write_orpheus_gguf(path, seed=0, hidden=128, heads=4, kv_heads=4,
                       head_dim=32, ffn=256)
    cfg = GenerationConfig(sample=False, seed=0, max_tokens=22, voice="zoe")
    state = ServerState({"o": path}, cfg, n_parallelism=2, data_parallel=True,
                        tensor_parallel=2)
    results = [state.submit({"kind": "tts", "model": "o", "prompt": "hi",
                             "config": cfg}) for _ in range(4)]
    assert all(r["success"] for r in results), [r["message"] for r in results]
    lens = {len(r["audio"]) for r in results}
    assert len(lens) == 1 and lens.pop() > 0
    # >= 2 replicas, each sharded over its own DISJOINT 2-device mesh
    replica_devs = []
    for key, runner in state._runners.items():
        assert isinstance(key, tuple)
        devs = runner.params["embd"].devices()
        assert len(devs) == 2          # tp=2: params span the replica's mesh
        replica_devs.append(frozenset(devs))
    assert len(replica_devs) >= 2
    assert len(frozenset.union(*replica_devs)) == 2 * len(replica_devs)
