"""Shared helpers for the Pallas kernels."""

from __future__ import annotations

#: THE input block walked by the drizzle deposit grid — every consumer
#: of :func:`block_partition` (tile sizing, the align loop's sparse
#: live-set/compaction, the kernel itself) must use the same shape, or
#: compacted pseudo-images would be regrouped differently than their
#: tiles were sized for. (16, 128) measured ~7% faster than (8, 128)
#: on v5e (fewer grid steps amortize the tile read-modify-write).
DEPOSIT_BLOCK = (16, 128)


def round_up(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n``."""
    return -(-n // m) * m


def block_partition(a, block: tuple[int, int] | None = None,
                    **pad_kw):
    """``(..., H, W) -> (..., nb, bh, bw)``: the deposit kernel's input
    block partition, padding the trailing axes to whole blocks.

    THE single definition of the walk the drizzle kernel's grid takes
    over its input — tile sizing (host numpy and device jnp), the align
    loop's sparse-deposit live-set/compaction, and the kernel's own
    blockization all call this, so their block indices are identical by
    construction. Blocks are ordered row-major over (by, bx).

    ``pad_kw`` forwards to ``np.pad`` / ``jnp.pad`` (e.g.
    ``constant_values=-1e6`` for coordinate planes, ``mode='edge'`` for
    bbox sizing). Works on numpy and jax arrays alike.
    """
    import numpy as np

    if block is None:
        block = DEPOSIT_BLOCK
    *lead, H, W = a.shape
    bh, bw = block
    Hp = round_up(H, bh)
    Wp = round_up(W, bw)
    if (Hp, Wp) != (H, W):
        spec = [(0, 0)] * len(lead) + [(0, Hp - H), (0, Wp - W)]
        if isinstance(a, np.ndarray):
            a = np.pad(a, spec, **pad_kw)
        else:
            import jax.numpy as jnp

            a = jnp.pad(a, spec, **pad_kw)
    a = a.reshape(*lead, Hp // bh, bh, Wp // bw, bw)
    n = a.ndim
    perm = tuple(range(len(lead))) + (n - 4, n - 2, n - 3, n - 1)
    return a.transpose(perm).reshape(
        *lead, (Hp // bh) * (Wp // bw), bh, bw)
