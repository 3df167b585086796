"""Single-pass fused AdamW: clip + moments + bias correction + decay + apply.

The reference pays for its optimizer with a separate CUDA kernel launch per
optax-like stage (clip, moment updates, bias correction, weight decay, apply —
torch.optim.AdamW internals, driven from /root/reference/train_unet.py:208-236).
On TPU the optimizer phase is pure HBM streaming (~0 FLOP): the SD-1.5 update
must read (grads, params, mu, nu) and write (params, mu, nu) — about 24 GB at
f32 on 860M params, i.e. ~29 ms at the v5e's HBM bandwidth.

This module computes the ENTIRE update as one expression per parameter leaf —
new_params, new_mu, new_nu from (g, p, mu, nu) and two scalars (clip scale,
learning rate) — so XLA emits a single multi-output elementwise loop per leaf:
every tensor is read once and written once, which is the roofline.

Measured on v5e (tools/adam_probe.py, dispatch-constant excluded via k-chained
applies in one program): 40.4 ms per apply on the SD-1.5-shaped tree =
596 GB/s effective (~73%% of the 819 GB/s HBM peak; a single flat 860M leaf
reaches 670 GB/s, so per-leaf overhead is only ~4.5 ms). The optax chain
measures the SAME inside a full train step — XLA already fuses it well — so
the fused transform's measured value is NOT the sync-step update itself but:
(a) ``fused_accumulate`` skipping the params-wide zero-update stream that
``optax.MultiSteps`` + ``apply_updates`` performs on every non-sync micro
step, and (b) one fewer donated tree alias (updates) in the step program.

Two APIs:

- ``fused_adamw(...)`` returns an optax ``GradientTransformationExtraArgs``-
  compatible object whose ``update`` matches
  ``chain(clip_by_global_norm(c), adamw(lr, wd))`` bit-for-bit in f32 (same
  count/bias-correction/schedule-index semantics), for drop-in use and parity
  tests. It additionally carries ``apply``:
- ``tx.apply(grads, state, params) -> (new_params, new_state)`` — the fused
  fast path used by the trainers; skips the separate
  ``optax.apply_updates`` read-modify-write pass over params.

``fused_accumulate(tx, every_k)`` replicates ``optax.MultiSteps`` mean-of-
micro-grads semantics around the fused path, but the non-sync micro steps
only touch the accumulator (running mean), not the params — MultiSteps emits
a zero-update tree that ``apply_updates`` still streams through params/HBM
every micro step.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import chex
import jax
import jax.numpy as jnp
import optax


class FusedAdamWState(NamedTuple):
    count: chex.Array  # int32; bias correction uses count+1, schedule uses count
    mu: chex.ArrayTree
    nu: chex.ArrayTree


class FusedTransformation(NamedTuple):
    """optax GradientTransformation protocol + the fused ``apply`` fast path."""

    init: Callable[[Any], FusedAdamWState]
    update: Callable  # (grads, state, params) -> (updates, new_state)
    apply: Callable  # (grads, state, params) -> (new_params, new_state)


def _clip_scale(grads, max_norm: float):
    """optax.clip_by_global_norm semantics: scale = 1 if ||g|| < c else c/||g||."""
    g_norm = optax.global_norm(grads)
    trust = max_norm / g_norm
    return jnp.where(g_norm < max_norm, 1.0, trust)


def fused_adamw(
    learning_rate: Union[float, optax.Schedule],
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
    max_grad_norm: Optional[float] = None,
    mu_dtype: Optional[Any] = None,
    nu_dtype: Optional[Any] = None,
) -> FusedTransformation:
    """Fused ``chain(clip_by_global_norm(max_grad_norm), adamw(...))``.

    ``max_grad_norm=None`` disables the clip (and its extra grad-tree read).
    ``mu_dtype`` stores the first moment in a narrower dtype (update math f32).
    ``nu_dtype`` does the same for the second moment — a stability trade: a
    bf16 nu quantizes E[g^2] to ~2^-9 relative, which reaches the update as
    ~2^-10 through the sqrt in the denominator (~0.1%); the moment update
    itself still accumulates in f32 before the narrowing store.
    """
    sched = learning_rate if callable(learning_rate) else (lambda _: learning_rate)

    def init_fn(params):
        mu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params
        )
        nu = jax.tree_util.tree_map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params
        )
        return FusedAdamWState(count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def _scalars(grads, state):
        count_inc = optax.safe_int32_increment(state.count)
        bc1 = 1.0 - b1 ** count_inc.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count_inc.astype(jnp.float32)
        lr = jnp.asarray(sched(state.count), jnp.float32)
        cs = (
            _clip_scale(grads, max_grad_norm)
            if max_grad_norm is not None
            else jnp.float32(1.0)
        )
        return count_inc, bc1, bc2, lr, cs

    def _leaf(g, p, mu, nu, bc1, bc2, lr, cs):
        """One fused read of (g, p, mu, nu) -> (new_p, new_mu, new_nu)."""
        g32 = g.astype(jnp.float32) * cs
        p32 = p.astype(jnp.float32)
        mu_n = b1 * mu.astype(jnp.float32) + (1.0 - b1) * g32
        nu_n = b2 * nu.astype(jnp.float32) + (1.0 - b2) * g32 * g32
        adam = (mu_n / bc1) / (jnp.sqrt(nu_n / bc2) + eps)
        p_n = p32 - lr * (adam + weight_decay * p32)
        return (
            p_n.astype(p.dtype),
            mu_n.astype(mu.dtype),
            nu_n.astype(nu.dtype),
        )

    def _run(grads, state, params):
        count_inc, bc1, bc2, lr, cs = _scalars(grads, state)
        out = jax.tree_util.tree_map(
            lambda g, p, mu, nu: _leaf(g, p, mu, nu, bc1, bc2, lr, cs),
            grads,
            params,
            state.mu,
            state.nu,
        )
        # out is a tree of (p, mu, nu) tuples; transpose to three trees
        outer = jax.tree_util.tree_structure(grads)
        inner = jax.tree_util.tree_structure((0, 0, 0))
        p_n, mu_n, nu_n = jax.tree_util.tree_transpose(outer, inner, out)
        return p_n, FusedAdamWState(count=count_inc, mu=mu_n, nu=nu_n)

    def apply_fn(grads, state, params):
        if params is None:
            raise ValueError("fused_adamw requires params")
        return _run(grads, state, params)

    def update_fn(grads, state, params=None):
        """optax-compatible: returns the additive updates tree (slow path —
        materializes updates and forces a second params pass in
        ``apply_updates``; trainers use ``apply`` instead)."""
        new_params, new_state = apply_fn(grads, state, params)
        updates = jax.tree_util.tree_map(
            lambda n, p: (n.astype(jnp.float32) - p.astype(jnp.float32)).astype(
                p.dtype
            ),
            new_params,
            params,
        )
        return updates, new_state

    return FusedTransformation(init=init_fn, update=update_fn, apply=apply_fn)


def as_fused_apply(tx: optax.GradientTransformation) -> FusedTransformation:
    """Give any optax transformation the ``apply`` protocol so it composes
    with :func:`fused_accumulate`.

    ``apply`` is the plain ``update`` + ``optax.apply_updates`` — one extra
    params read-modify-write, but ONLY on the sync step: under
    ``fused_accumulate`` the non-sync micro steps never reach the inner
    transform at all, which is the entire memory/traffic win over
    ``optax.MultiSteps`` (zero-update params stream every micro step plus an
    f32 accumulator). Used for the 8-bit Adam + gradient-accumulation
    composition (trainers/optim.py)."""

    def apply_fn(grads, state, params):
        updates, new_state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), new_state

    return FusedTransformation(init=tx.init, update=tx.update, apply=apply_fn)


class FusedAccumState(NamedTuple):
    mini_step: chex.Array  # int32 in [0, every_k)
    acc: chex.ArrayTree  # running mean of micro-grads, f32
    inner: Any  # FusedAdamWState, or any optax state via as_fused_apply


class FusedAccumTransformation(NamedTuple):
    init: Callable[[Any], FusedAccumState]
    update: Callable
    apply: Callable


def fused_accumulate(
    tx: FusedTransformation,
    every_k: int,
    acc_dtype: Optional[Any] = None,
) -> FusedAccumTransformation:
    """optax.MultiSteps semantics (mean of the k micro-grads, inner update on
    the k-th) around a FusedTransformation, without streaming a zero-update
    through the params on non-sync micro steps.

    ``acc_dtype`` stores the gradient accumulator in a narrower dtype
    (accumulation math stays f32; each store rounds). Measured necessity: at
    SD-1.5 512-scale the f32 accumulator (3.44GB) pushes params+acc+mu+nu to
    13.8GB and accumulation OOMs the 15.75GB HBM even at batch 2 — bf16
    (1.72GB) is the lever that makes `--gradient-accumulation-steps` fit.
    """
    if every_k <= 1:
        raise ValueError("fused_accumulate requires every_k > 1")

    def init_fn(params):
        acc = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, acc_dtype or jnp.float32), params
        )
        return FusedAccumState(
            mini_step=jnp.zeros([], jnp.int32), acc=acc, inner=tx.init(params)
        )

    def _accumulate(grads, state):
        # running mean: acc += (g - acc) / (i + 1)  (MultiSteps' formula)
        i = state.mini_step.astype(jnp.float32)
        return jax.tree_util.tree_map(
            lambda a, g: (
                a.astype(jnp.float32)
                + (g.astype(jnp.float32) - a.astype(jnp.float32)) / (i + 1.0)
            ).astype(a.dtype),
            state.acc,
            grads,
        )

    def apply_fn(grads, state, params):
        acc = _accumulate(grads, state)
        is_sync = state.mini_step == every_k - 1

        def sync(_):
            new_params, new_inner = tx.apply(acc, state.inner, params)
            zero = jax.tree_util.tree_map(jnp.zeros_like, acc)
            return new_params, FusedAccumState(
                mini_step=jnp.zeros([], jnp.int32), acc=zero, inner=new_inner
            )

        def skip(_):
            return params, FusedAccumState(
                mini_step=state.mini_step + 1, acc=acc, inner=state.inner
            )

        return jax.lax.cond(is_sync, sync, skip, None)

    def update_fn(grads, state, params=None):
        new_params, new_state = apply_fn(grads, state, params)
        updates = jax.tree_util.tree_map(
            lambda n, p: (n.astype(jnp.float32) - p.astype(jnp.float32)).astype(
                p.dtype
            ),
            new_params,
            params,
        )
        return updates, new_state

    return FusedAccumTransformation(init=init_fn, update=update_fn, apply=apply_fn)
