"""Host-level jit execution through an explicit AOT executable cache.

Root cause this works around: this jax build's re-lowerings can HOIST
deduplicated constants as leading executable arguments
(`Lowering.const_args`, docs/internals/constants), and its C++ jit
fastpath does NOT pass them on repeat dispatch
(pjit.py "TODO(necula): remove num_const_args when fixing the C++
path") — the second same-shape call of an affected jitted function dies
with "Execution supplied N buffers but compiled program expected N+1".
First observed in the pretrain workload via
ops/terminal.batched_local_align and the classifier feature program.

`aot_call` bypasses that dispatch entirely: lower+compile once per
(tag, shapes, dtypes, backend), remember the lowering's const_args, and
invoke the executable with them prepended.  Host-level call sites only —
pass concrete arrays, never tracers.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax

_CACHE: Dict[Tuple, tuple] = {}


def _compile_with_consts(fn: Callable, args):
    lowered = jax.jit(fn).lower(*args)
    const_args = tuple(getattr(lowered._lowering, "const_args", ()) or ())
    return lowered.compile(), const_args


def aot_call(tag: str, fn: Callable, *args):
    """Execute `fn(*args)` through a cached AOT-compiled executable.

    fn must be a pure function of its positional array arguments; `tag`
    must uniquely identify fn (+ any closed-over statics).
    """
    key = ((tag, jax.default_backend())
           + tuple((a.shape, str(a.dtype)) for a in args))
    ent = _CACHE.get(key)
    if ent is None:
        ent = _CACHE[key] = _compile_with_consts(fn, args)
    exe, const_args = ent
    try:
        return exe(*const_args, *args)
    except (TypeError, ValueError) as e:
        # the re-lowering hoisted an arg it did not record in const_args
        # (observed: MLIR main gains a tensor<i32> while const_args stays
        # empty).  A FRESH jit object's first call takes the Python slow
        # path, which threads every implicit argument correctly.
        from hite_tpu.utils.log import logger

        logger.warning("aot_call(%s): executable call failed (%s); "
                       "falling back to a fresh jit", tag, e)
        _CACHE.pop(key, None)
        return jax.jit(fn)(*args)
