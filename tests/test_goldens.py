"""Checked-in golden outputs per model (seeded tiny random weights).

The numpy parity harness proves the math; these goldens freeze it — any
future change to kernels, loaders, sampling, or codec plumbing that shifts
output shows up as a golden diff.  Regenerate deliberately with:
    python tests/test_goldens.py regen
"""

import os

import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")

CASES = ["kokoro", "parler", "dia", "orpheus"]


def _generate(name, tmp_dir):
    from tts_tpu.models.registry import runner_from_file
    from tts_tpu.runtime.api import GenerationConfig

    path = os.path.join(tmp_dir, f"{name}.gguf")
    if name == "kokoro":
        from tts_tpu.convert.builder_kokoro import KokoroDims, write_kokoro_gguf
        write_kokoro_gguf(path, KokoroDims.tiny(), seed=0)
        cfg = GenerationConfig(voice="af_heart", seed=0)
        text = "golden output"
    elif name == "parler":
        from tts_tpu.convert.builder_parler import write_parler_gguf
        write_parler_gguf(path, seed=0)
        cfg = GenerationConfig(seed=0, sample=False, max_tokens=24)
        text = "golden"
    elif name == "dia":
        from tts_tpu.convert.builder_dia import write_dia_gguf
        write_dia_gguf(path, seed=0)
        cfg = GenerationConfig(seed=0, sample=False, max_tokens=30)
        text = "[S1] golden."
    elif name == "orpheus":
        from tts_tpu.convert.builder_orpheus import write_orpheus_gguf
        write_orpheus_gguf(path, seed=0, hidden=64, head_dim=16)
        cfg = GenerationConfig(seed=0, sample=False, max_tokens=22, voice="zoe")
        text = "golden"
    runner = runner_from_file(path, cfg)
    resp = runner.generate(text, cfg)
    return resp.audio.astype(np.float32), resp.sample_rate


@pytest.mark.parametrize("name", CASES)
def test_golden(name, tmp_path):
    golden_path = os.path.join(GOLDEN_DIR, f"{name}.npz")
    assert os.path.exists(golden_path), (
        f"golden missing — run `python tests/test_goldens.py regen`")
    want = np.load(golden_path)
    audio, sr = _generate(name, str(tmp_path))
    assert sr == int(want["sample_rate"])
    assert audio.shape == want["audio"].shape, (
        f"{name}: golden length {want['audio'].shape} != {audio.shape}")
    if audio.size:
        scale = np.abs(want["audio"]).max() + 1e-9
        np.testing.assert_allclose(audio, want["audio"], atol=5e-4 * scale,
                                   rtol=0, err_msg=f"{name} golden drifted")


if __name__ == "__main__":
    import sys
    import tempfile

    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        import jax

        jax.config.update("jax_platforms", "cpu")
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with tempfile.TemporaryDirectory() as td:
            for name in CASES:
                audio, sr = _generate(name, td)
                np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.npz"),
                                    audio=audio, sample_rate=sr)
                print(f"{name}: {len(audio)} samples @ {sr} Hz")
