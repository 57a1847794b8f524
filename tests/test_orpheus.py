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


def test_prompt_too_long(runner):
    with pytest.raises(TTSError):
        runner.generate("a " * 2000, GenerationConfig())
