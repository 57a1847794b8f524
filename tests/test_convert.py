"""Converter mapping-function tests (no network; synthetic torch-style dicts)."""

import numpy as np

from tts_tpu.convert.from_hf import (
    fold_weight_norms, map_kokoro_albert, map_kokoro_text_encoder,
    regularize_weight_norm, split_adain, split_lstm_tensors,
)


def test_weight_norm_regularization(rng):
    v = rng.standard_normal((8, 4, 3)).astype(np.float32)
    g = rng.standard_normal(8).astype(np.float32)
    w = regularize_weight_norm(g, v)
    # each output channel has norm |g|
    norms = np.linalg.norm(w.reshape(8, -1), axis=1)
    np.testing.assert_allclose(norms, np.abs(g), rtol=1e-5)


def test_fold_weight_norms(rng):
    sd = {
        "conv.weight_v": rng.standard_normal((4, 2, 3)).astype(np.float32),
        "conv.weight_g": np.ones(4, np.float32),
        "conv.bias": np.zeros(4, np.float32),
        "other.weight": np.ones((2, 2), np.float32),
    }
    out = fold_weight_norms(sd)
    assert "conv.weight" in out and "conv.weight_v" not in out
    assert "other.weight" in out


def test_split_lstm_tensors(rng):
    w = rng.standard_normal((4 * 16, 8)).astype(np.float32)
    out = split_lstm_tensors("base.lstm", "weight_ih_l0", w)
    assert set(out) == {f"base.lstm.0.weights.{i}" for i in (0, 2, 4, 6)}
    np.testing.assert_array_equal(out["base.lstm.0.weights.0"], w[:16])
    out_r = split_lstm_tensors("base.lstm", "weight_hh_l0_reverse", w)
    assert "base.lstm.0.reverse_weights.1" in out_r


def test_split_adain(rng):
    w = rng.standard_normal((64, 16)).astype(np.float32)
    out = split_adain("blk", "norm1", w)
    np.testing.assert_array_equal(out["blk.norm1_gamma_weight"], w[:32])
    np.testing.assert_array_equal(out["blk.norm1_beta_weight"], w[32:])


def test_map_kokoro_albert():
    sd = {
        "embeddings.word_embeddings.weight": np.zeros((10, 4), np.float32),
        "embeddings.token_type_embeddings.weight": np.ones((2, 4), np.float32),
        "encoder.albert_layer_groups.0.albert_layers.0.attention.query.weight":
            np.zeros((4, 4), np.float32),
    }
    out = map_kokoro_albert(sd)
    assert "kokoro.albert.token_embd" in out
    assert out["kokoro.albert.token_type_embd"].shape == (4,)
    assert "kokoro.albert.layer.0.q" in out


def test_map_kokoro_text_encoder_names():
    sd = {
        "embedding.weight": np.zeros((10, 8), np.float32),
        "cnn.0.0.weight_v": np.ones((8, 8, 5), np.float32),
        "cnn.0.0.weight_g": np.ones(8, np.float32),
        "cnn.0.0.bias": np.zeros(8, np.float32),
        "cnn.0.1.weight": np.ones(8, np.float32),
        "cnn.0.1.bias": np.zeros(8, np.float32),
        "lstm.weight_ih_l0": np.zeros((16, 8), np.float32),
    }
    out = map_kokoro_text_encoder(sd)
    assert "kokoro.text_encoder.embedding_weight" in out
    assert "kokoro.text_encoder.layers.0.weight" in out
    assert "kokoro.text_encoder.layers.0.gamma" in out
    assert "kokoro.text_encoder.lstm.0.weights.0" in out
