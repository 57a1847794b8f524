"""On-device sampler tests (the reference ships none — SURVEY.md §4)."""

import numpy as np

import jax
import jax.numpy as jnp

from tts_tpu.ops.sampling import init_state, sample_tokens


def logits_for(probs):
    return jnp.log(jnp.asarray(probs, jnp.float32))


def test_greedy():
    logits = jnp.asarray([[0.1, 5.0, 0.2], [3.0, 0.0, -1.0]])
    toks, state = sample_tokens(jax.random.PRNGKey(0), logits, init_state(2),
                                do_sample=False)
    np.testing.assert_array_equal(np.asarray(toks), [1, 0])
    np.testing.assert_array_equal(np.asarray(state["count"]), [1, 1])


def test_top_k_restricts_support():
    logits = logits_for([[0.5, 0.3, 0.15, 0.05]])
    seen = set()
    for i in range(50):
        toks, _ = sample_tokens(jax.random.PRNGKey(i), logits, init_state(1),
                                top_k=2)
        seen.add(int(toks[0]))
    assert seen <= {0, 1}
    assert len(seen) == 2


def test_top_p_restricts_support():
    logits = logits_for([[0.55, 0.3, 0.1, 0.05]])
    seen = set()
    for i in range(80):
        toks, _ = sample_tokens(jax.random.PRNGKey(i), logits, init_state(1),
                                top_p=0.8)
        seen.add(int(toks[0]))
    # nucleus inclusive: {0.55, 0.3} reaches 0.85 >= 0.8 -> support {0, 1}
    assert seen <= {0, 1}
    assert len(seen) == 2


def test_temperature_sharpens():
    logits = logits_for([[0.6, 0.4]])
    cold = [int(sample_tokens(jax.random.PRNGKey(i), logits, init_state(1),
                              temperature=0.05)[0][0]) for i in range(40)]
    assert all(t == 0 for t in cold)


def test_repetition_penalty_state_tracking():
    logits = jnp.asarray([[10.0, 5.0]])
    state = init_state(1)
    for step in range(3):
        toks, state = sample_tokens(jax.random.PRNGKey(step), logits, state,
                                    do_sample=False)
        assert int(toks[0]) == 0
    assert int(state["count"][0]) == 3

    # strong penalty drives the sampler away from the repeated token
    toks, state = sample_tokens(jax.random.PRNGKey(99), logits, state,
                                repetition_penalty=1e6, temperature=0.01)
    assert int(toks[0]) == 1
    assert int(state["count"][0]) == 1


def test_multi_head_independent():
    logits = logits_for([[0.99, 0.01], [0.01, 0.99]])
    toks, _ = sample_tokens(jax.random.PRNGKey(3), logits, init_state(2),
                            temperature=0.05)
    np.testing.assert_array_equal(np.asarray(toks), [0, 1])


def test_use_top_p_false_matches_top_p_one(rng):
    """Statically skipping the nucleus filter (use_top_p=False) draws the
    same tokens as top_p=1.0 through the filter — the filter is a no-op at
    1.0, it just costs a full [H, V] sort per step."""
    import jax
    import jax.numpy as jnp
    from tts_tpu.ops.sampling import init_state, sample_tokens

    logits = jnp.asarray(rng.standard_normal((3, 257)).astype(np.float32))
    key = jax.random.PRNGKey(7)
    a, sa = sample_tokens(key, logits, init_state(3), temperature=0.8,
                          top_k=13, top_p=1.0, use_top_p=True)
    b, sb = sample_tokens(key, logits, init_state(3), temperature=0.8,
                          top_k=13, top_p=1.0, use_top_p=False)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_top_p_bisection_matches_sorted_reference(rng):
    """The sort-free nucleus threshold keeps exactly the minimal sorted
    prefix with cumsum >= top_p (inclusive), across skewed and near-uniform
    distributions."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from tts_tpu.ops.sampling import init_state, sample_tokens

    for tp, scale in [(0.5, 4.0), (0.9, 4.0), (0.97, 0.3), (0.2, 8.0)]:
        logits = (rng.standard_normal((3, 4096)) * scale).astype(np.float32)
        # many draws from the filtered distribution: the support must equal
        # the sorted-prefix support
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        probs /= probs.sum(-1, keepdims=True)
        order = np.argsort(-probs, axis=-1)
        keep_ref = np.zeros_like(probs, dtype=bool)
        for h in range(3):
            c = 0.0
            for idx in order[h]:
                keep_ref[h, idx] = True
                c += probs[h, idx]
                if c >= tp:
                    break
        draws = []
        for s in range(200):
            toks, _ = sample_tokens(jax.random.PRNGKey(s),
                                    jnp.asarray(logits), init_state(3),
                                    top_p=tp)
            draws.append(np.asarray(toks))
        draws = np.stack(draws)              # [200, 3]
        for h in range(3):
            assert all(keep_ref[h, t] for t in draws[:, h]), (tp, h)
