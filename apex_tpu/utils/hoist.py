"""jit with closed-over arrays hoisted to runtime arguments.

Jitted solver steps close over the problem's static index plans and
observation data (tens to hundreds of MB at BA scale). Left as closure
captures they are embedded into the XLA program as literal constants —
bloating the serialized executable (venice: >200 MB of MLIR, rejected
by the remote-TPU compile tunnel with HTTP 413) and defeating
executable reuse across problems of identical structure.
``jax.closure_convert`` only hoists *inexact* (float) constants; the
index plans are int32, so this module hoists every jaxpr const
regardless of dtype via make_jaxpr + eval_jaxpr.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _aval(x):
    if isinstance(x, jax.ShapeDtypeStruct):
        return x
    return jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x))


def hoisted_jit(fn, *example):
    """Return a jitted callable equivalent to ``fn`` in which every array
    the trace closes over is passed as a runtime argument instead of being
    embedded as a program constant. ``example`` fixes the input structure
    (arrays or ShapeDtypeStructs; pytrees allowed)."""
    flat_ex, in_tree = jax.tree_util.tree_flatten(example)
    store = {}

    def flat_fn(*flat):
        args = jax.tree_util.tree_unflatten(in_tree, flat)
        out = fn(*args)
        out_flat, out_tree = jax.tree_util.tree_flatten(out)
        store["out_tree"] = out_tree
        return out_flat

    closed = jax.make_jaxpr(flat_fn)(*[_aval(x) for x in flat_ex])
    jaxpr, consts = closed.jaxpr, list(closed.consts)
    out_tree = store["out_tree"]

    @jax.jit
    def conv(consts, *flat):
        return jax.core.eval_jaxpr(jaxpr, consts, *flat)

    def wrapped(*args):
        flat, tree = jax.tree_util.tree_flatten(args)
        if tree != in_tree:
            raise TypeError(
                f"hoisted_jit input structure changed: {tree} != {in_tree}")
        out_flat = conv(consts, *flat)
        return jax.tree_util.tree_unflatten(out_tree, out_flat)

    wrapped.n_hoisted = len(consts)
    wrapped.hoisted_bytes = sum(
        getattr(c, "nbytes", 0) for c in consts)
    return wrapped
