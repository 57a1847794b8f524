"""T5 encoder tests + the Parler conditional-prompt swap end-to-end."""

import numpy as np
import pytest

from tts_tpu.convert.builder_t5 import write_t5_gguf
from tts_tpu.core.gguf import GGUFFile
from tts_tpu.models.t5 import T5Runner, relative_position_buckets


@pytest.fixture(scope="module")
def t5_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("t5") / "tiny_t5.gguf"
    write_t5_gguf(path)
    return str(path)


def test_t5_encode_shapes(t5_path):
    with GGUFFile(t5_path) as f:
        t5 = T5Runner.from_gguf(f)
    out = t5.encode("hello world")
    assert out.ndim == 2
    assert out.shape[1] == 64          # down-projected output size
    assert np.isfinite(out).all()


def test_t5_encode_deterministic(t5_path):
    with GGUFFile(t5_path) as f:
        t5 = T5Runner.from_gguf(f)
    a = t5.encode("abc")
    b = t5.encode("abc")
    np.testing.assert_array_equal(a, b)


def test_relative_position_buckets():
    b = np.asarray(relative_position_buckets(8))
    assert b.shape == (8, 8)
    assert b[0, 0] == 0
    # future keys (key > query) get the +half offset — the HF convention,
    # verified against transformers in test_hf_parity.py
    assert b[2, 4] >= 16 and b[4, 2] < 16
    # symmetric distances share a magnitude bucket modulo the direction offset
    assert b[2, 4] - 16 == b[4, 2]


def test_parler_conditional_prompt_swap(t5_path, tmp_path):
    """update_conditional_prompt re-encodes the voice prompt and changes
    generation (parity: parler/model.cpp:510-518)."""
    from tts_tpu.convert.builder_parler import write_parler_gguf
    from tts_tpu.models.registry import runner_from_file
    from tts_tpu.runtime.api import GenerationConfig

    path = tmp_path / "parler.gguf"
    write_parler_gguf(path, enc_hidden=64)
    runner = runner_from_file(str(path))
    cfg = GenerationConfig(seed=3, sample=False, max_tokens=10)
    before = runner.generate("ab", cfg)
    old_kv = np.asarray(runner.cross_kv["k"])
    runner.update_conditional_prompt(t5_path, "a calm voice")
    new_kv = np.asarray(runner.cross_kv["k"])
    assert old_kv.shape[1] != new_kv.shape[1] or not np.allclose(old_kv, new_kv)
    after = runner.generate("ab", cfg)
    assert np.isfinite(after.audio).all()
