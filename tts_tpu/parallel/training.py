"""Sharded training step (dp x tp) for model fine-tuning.

The reference is inference-only; this module adds the capability the TPU
stack gets almost for free: a jitted, mesh-sharded training step.  Round 1
ships a duration-predictor fine-tuning step on Kokoro (L2 on predicted
durations — the standard duration-distillation objective); the AR decoders
get a CE next-token step when they land.

Sharding layout:
  batch                      -> P("dp", ...)
  attention q/k/v weights    -> P(None, "tp")   (head-sharded)
  attention output weight    -> P("tp", None)   (contraction -> GSPMD psum)
  FFN in / out               -> P(None, "tp") / P("tp", None)
  everything else            -> replicated
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tts_tpu.models.kokoro import KokoroConfig, duration_raw


def kokoro_param_specs(params) -> dict:
    """PartitionSpec pytree for Kokoro params under a (dp, tp) mesh."""
    specs = jax.tree_util.tree_map(lambda _: P(), params)
    for layer_specs in specs["albert"]["layers"]:
        for n in ("q_w", "k_w", "v_w", "ffn_w"):
            layer_specs[n] = P(None, "tp")
        for n in ("q_b", "k_b", "v_b", "ffn_b"):
            layer_specs[n] = P("tp")
        for n in ("o_w", "ffn_out_w"):
            layer_specs[n] = P("tp", None)
    return specs


def shard_params(params, mesh: Mesh):
    """device_put the param pytree with tp shardings.  Returns (params, specs)."""
    specs = kokoro_param_specs(params)
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_s = treedef.flatten_up_to(specs)
    placed = [jax.device_put(x, NamedSharding(mesh, s)) for x, s in zip(flat_p, flat_s)]
    return jax.tree_util.tree_unflatten(treedef, placed), specs


class DurationTrainer:
    """Duration-distillation fine-tuning of Kokoro's predictor over a mesh."""

    def __init__(self, cfg: KokoroConfig, mesh: Mesh, learning_rate: float = 1e-4):
        self.cfg = cfg
        self.mesh = mesh
        self.tx = optax.adam(learning_rate)
        self.batch_sharding = NamedSharding(mesh, P("dp"))
        cfg_static = cfg

        def loss_fn(params, tokens, mask, style, target):
            def one(tok, m, st, tgt):
                sums, _ = duration_raw(params, cfg_static, tok, m, st)
                return jnp.sum(jnp.square((sums - tgt) * m)) / jnp.maximum(jnp.sum(m), 1.0)
            return jnp.mean(jax.vmap(one)(tokens, mask, style, target))

        def step(params, opt_state, tokens, mask, style, target):
            loss, grads = jax.value_and_grad(loss_fn)(params, tokens, mask, style, target)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss

        self._step = jax.jit(step, donate_argnums=(0, 1))

    def init(self, params):
        """Shard params over the mesh and build a matching optimizer state."""
        params, _ = shard_params(params, self.mesh)
        opt_state = jax.jit(self.tx.init)(params)
        return params, opt_state

    def train_step(self, params, opt_state, tokens, mask, style, target):
        """One step: batch arrays [B, ...] are dp-sharded on entry."""
        put = lambda x: jax.device_put(jnp.asarray(x), self.batch_sharding)
        return self._step(params, opt_state, put(tokens), put(mask),
                          put(style), put(target))
