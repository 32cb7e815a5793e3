"""Pallas-fused batched Cholesky factor+solve for the IPM's KKT systems.

Hybrid strategy (docs/ROADMAP.md): the IPM's matmuls are MXU-bound and XLA
handles them well; the ~100 tiny sequential ops of the factorization and
triangular solves are dispatch-bound on the remote TPU runtime. This module
fuses exactly that part: one kernel factors TB problems' (n, n) SPD matrices
and solves one RHS; a second kernel re-solves with the stored factor (the
Mehrotra corrector reuses the predictor's factorization).

Layout: column-major flat pack M_t (n*n, B) with row (j*n + i) = M[i, j] and
the batch in lanes; column j of every problem is the contiguous sublane block
M_t[j*n:(j+1)*n, :], so the left-looking recurrences are static row slices —
no reshapes, no relayouts. Large tiles (default 512 lanes) amortize VPU op
issue; VMEM stays small because the (mI, ...) constraint operands never enter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _chol_vmem_need(n2: int, n_p: int, tile: int, blocks: int) -> int:
    """Scoped-VMEM model for the unblocked chol kernels: `blocks` (n2, T)
    matrix blocks + (n_p, T) vector blocks, each DOUBLE-buffered by Mosaic,
    PLUS one (n2, T) stack allocation — the kernels hold the whole factor as
    live values (measured on-chip: nz_p=104/tile 256 chol_solve allocates
    28.10M = 22.2M dbuf + 5.5M... the r4 first-cut model without the stack
    term under-granted by 2.57M and Mosaic OOMed 'on stack')."""
    return (blocks * 2 * (n2 + 2 * n_p) + n2) * tile * 4


_VMEM_BUDGET = 60 * 1024 * 1024  # grant ceiling, ~2x headroom under 128M physical


def _vlim_raise(n2: int, n_p: int, tile: int, blocks: int) -> int:
    """vmem_limit_bytes grant: need + 6M headroom when the 16M default is
    insufficient, else 0 (small nz — leave the compiler's default policy
    alone). This is the r4 mechanism that unlocks both factor reuse AND
    tile 256 at the DMS nz_p=104 shape (the unrolled recurrences are
    per-grid-step issue-bound: wider tiles halve the sequential op
    issues per batch). Grants are capped at the same 60M budget the
    factor-store gate uses — a shape that needs more is infeasible on
    this path and must fail loudly, not over-grant past physical VMEM."""
    need = _chol_vmem_need(n2, n_p, tile, blocks)
    if need <= (14 << 20):
        return 0
    grant = need + (6 << 20)
    if grant > _VMEM_BUDGET:
        raise ValueError(
            f"chol kernel scoped-VMEM need {need / 2**20:.1f}M "
            f"(n_p={n_p}, tile={tile}, blocks={blocks}) exceeds the "
            f"{_VMEM_BUDGET >> 20}M grant budget; shape infeasible on this "
            "path — shrink the problem or use the XLA fallback")
    return grant


def _tile_cap(n_p: int, tile: int, blocks: int) -> int:
    """Largest power-of-two tile <= `tile` whose (n_p^2, T) VMEM blocks fit.

    `blocks` counts the (n2, T) f32 blocks resident per grid step (factor
    kernel: M in + L out = 2; resolve: L in = 1); Mosaic double-buffers
    each, plus the live-factor stack (_chol_vmem_need). Measured NEGATIVE
    (r4, v5e, DMS nz_p=104 b1024): widening to tile 256 via a raised
    vmem_limit grant is SLOWER on both paths (nostore 58.0, store 62.7-63.7
    vs 51.9-52.6 ms/step at tile 128) — a (104, 256) vector op costs two
    issue slots anyway, so wide tiles buy no issue-depth and cost
    double-buffering overlap. Keep the largest tile that fits the DEFAULT
    scoped limit; at the 128-lane floor the kernels raise vmem_limit_bytes
    to _vlim_raise instead (how the factor-store path runs at nz_p=104).
    Halving preserves divisibility of the caller-padded batch."""
    budget = 14 * 1024 * 1024
    t = tile
    # Pallas TPU requires lane blocks divisible by 128 -> floor at 128
    while t > 128 and _chol_vmem_need(n_p * n_p, n_p, t, blocks) > budget:
        t //= 2
    return t


def factor_store_feasible(n: int) -> bool:
    """True when the factor-storing kernel (chol_factor_solve + chol_resolve)
    fits scoped VMEM at the 128-lane floor tile (feasibility is evaluated at
    the floor: larger tiles only need MORE VMEM, and the kernels halve the
    tile toward 128 anyway via _tile_cap). Under the DEFAULT 16M scoped
    limit that holds only for nz_p < ~76 (measured OOM at the DMS nz_p=104
    shape); _factor_solve_call RAISES vmem_limit_bytes when the
    double-buffered M-in + L-out blocks need it (26.8M per _chol_vmem_need
    at nz_p=104/tile 128 — the same mechanism the blocked kernel already
    uses at 24M), which extends factor reuse to the DMS flagship. The gate
    is _chol_vmem_need at the 128-lane floor against the raised 60M budget
    (~2x headroom under the 128M physical VMEM); set LBMPC_CHOL_STORE=0 to
    force the refactor-per-solve path for A/Bs."""
    import os
    if os.environ.get("LBMPC_CHOL_STORE") == "0":
        return False
    n_p = _round_up(n, 8)
    return _chol_vmem_need(n_p * n_p, n_p, 128, 2) <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def chol_factor_solve(M: jax.Array, b: jax.Array, tile: int = 512,
                      interpret: bool = False):
    """Factor SPD M (B, n, n) and solve M x = b (B, n).

    Returns (L_flat (B, n*n) column-major-packed factor, x (B, n)).
    float32 compute; pad n to sublane multiple with identity diagonal.
    """
    B, n, _ = M.shape
    n_p = _round_up(n, 8)
    with jax.enable_x64(False):
        Mp = jnp.zeros((B, n_p, n_p), jnp.float32)
        Mp = Mp.at[:, :n, :n].set(M.astype(jnp.float32))
        idx = jnp.arange(n, n_p)
        Mp = Mp.at[:, idx, idx].set(1.0)
        bp = jnp.zeros((B, n_p), jnp.float32).at[:, :n].set(b.astype(jnp.float32))
        # flat pack: row (j*n_p + i) = M[i, j]  -> transpose to (n_p, n_p, B)
        M_t = jnp.transpose(Mp, (2, 1, 0)).reshape(n_p * n_p, B)
        b_t = bp.T
        L_t, x_t = _factor_solve_call(M_t, b_t, n_p,
                                      _tile_cap(n_p, tile, 2), interpret)
        return L_t.T, x_t[:n, :].T


@functools.partial(jax.jit, static_argnames=("n_p", "tile", "interpret"))
def _factor_solve_call(M_t, b_t, n_p, tile, interpret):
    B = M_t.shape[1]
    n2 = n_p * n_p
    import os
    blocked = n_p >= 32 and os.environ.get("LBMPC_CHOL_BLOCKED") == "1"

    def kernel_blocked(M_ref, b_ref, T8_ref, B8_ref, L_out, x_out):
        # copy M into the L output block, then factor in place there (no
        # HBM aliasing: it does not merge VMEM buffers — see _solve_call)
        for _s in range(n_p // _BLOCK):
            _sl = slice(_s * _BLOCK * n_p, (_s + 1) * _BLOCK * n_p)
            L_out[_sl, :] = M_ref[_sl, :]
        _chol_blocked_inplace(L_out, n_p, T8_ref, B8_ref)
        col = lambda j: L_out[j * n_p:(j + 1) * n_p, :]
        y = _tri_lower(col, b_ref[:], n_p)
        x_out[:] = _tri_upper_red(col, y, n_p)

    def kernel(M_ref, b_ref, L_out, x_out):
        Ls = _chol_cols(M_ref, n_p)
        y = _tri_lower(Ls.__getitem__, b_ref[:], n_p)
        x = (_tri_upper_red(Ls.__getitem__, y, n_p) if n_p >= 32
             else _tri_upper_t(Ls, y, n_p))
        for j in range(n_p):
            L_out[j * n_p : (j + 1) * n_p, :] = Ls[j]
        x_out[:] = x

    in_specs = [
        pl.BlockSpec((n2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
    ]
    operands = [M_t, b_t]
    if blocked:
        T8, B8 = _blocked_consts(n_p)
        in_specs += [
            pl.BlockSpec((_BLOCK * n_p, n_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK * n_p, _BLOCK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        operands += [T8, B8]
    vlim = max(24 << 20 if blocked else 0, _vlim_raise(n2, n_p, tile, 2))
    return pl.pallas_call(
        kernel_blocked if blocked else kernel,
        grid=(B // tile,),
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=vlim)
                         if vlim else None),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((n2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n2, B), jnp.float32),
            jax.ShapeDtypeStruct((n_p, B), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def chol_solve(M: jax.Array, b: jax.Array, tile: int = 512,
               interpret: bool = False):
    """Factor SPD M (B, n, n) and solve M x = b (B, n) WITHOUT storing L.

    The large-nz path (factor_store_feasible(n) False — e.g. the DMS
    flagship's nz_p=104, where the L-out block alone busts scoped VMEM):
    callers refactor for each right-hand side instead of resolving. Returns
    x (B, n)."""
    B, n, _ = M.shape
    n_p = _round_up(n, 8)
    with jax.enable_x64(False):
        Mp = jnp.zeros((B, n_p, n_p), jnp.float32)
        Mp = Mp.at[:, :n, :n].set(M.astype(jnp.float32))
        idx = jnp.arange(n, n_p)
        Mp = Mp.at[:, idx, idx].set(1.0)
        bp = jnp.zeros((B, n_p), jnp.float32).at[:, :n].set(b.astype(jnp.float32))
        M_t = jnp.transpose(Mp, (2, 1, 0)).reshape(n_p * n_p, B)
        x_t = _solve_call(M_t, bp.T, n_p, _tile_cap(n_p, tile, 1), interpret)
        return x_t[:n, :].T


@functools.partial(jax.jit, static_argnames=("n_p", "tile", "interpret"))
def _solve_call(M_t, b_t, n_p, tile, interpret):
    B = M_t.shape[1]
    n2 = n_p * n_p
    # Measured NEGATIVE (r4, v5e, DMS nz_p=104 b1024): the slab-blocked
    # factorization (_chol_blocked_inplace) is 5x SLOWER than the unrolled
    # per-column path (287 vs 54 ms/step) — its TILE8/BC8 "broadcast via
    # MXU" ops are dense (832,104)@(104,T) matmuls, ~0.9 TFLOP/step of pure
    # replication work at f32-HIGHEST. Kept behind LBMPC_CHOL_BLOCKED=1 for
    # reproduction; the op-count win that survives is _tri_upper_red.
    import os
    blocked = n_p >= 32 and os.environ.get("LBMPC_CHOL_BLOCKED") == "1"

    def kernel_blocked(M_ref, b_ref, T8_ref, B8_ref, x_out, L_sc):
        # factor into a VMEM SCRATCH (single-buffered, 5.5M at n_p=104 —
        # vs +11M for an aliased (n2, T) output: HBM aliasing does NOT
        # merge the VMEM block buffers, measured 26.6M scoped). Slab-chunked
        # copy keeps the transient small; all reads after the copy go
        # through the scratch ref, so at most ~one column is live.
        for _s in range(n_p // _BLOCK):
            _sl = slice(_s * _BLOCK * n_p, (_s + 1) * _BLOCK * n_p)
            L_sc[_sl, :] = M_ref[_sl, :]
        _chol_blocked_inplace(L_sc, n_p, T8_ref, B8_ref)
        col = lambda j: L_sc[j * n_p:(j + 1) * n_p, :]
        y = _tri_lower(col, b_ref[:], n_p)
        x_out[:] = _tri_upper_red(col, y, n_p)

    def kernel(M_ref, b_ref, x_out):
        Ls = _chol_cols(M_ref, n_p)
        y = _tri_lower(Ls.__getitem__, b_ref[:], n_p)
        x_out[:] = (_tri_upper_red(Ls.__getitem__, y, n_p) if n_p >= 32
                    else _tri_upper_t(Ls, y, n_p))

    if not blocked:
        vlim = _vlim_raise(n2, n_p, tile, 1)
        return pl.pallas_call(
            kernel,
            grid=(B // tile,),
            compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=vlim)
                             if vlim else None),
            in_specs=[
                pl.BlockSpec((n2, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_p, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((n_p, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((n_p, B), jnp.float32),
            interpret=interpret,
        )(M_t, b_t)
    T8, B8 = _blocked_consts(n_p)
    return pl.pallas_call(
        kernel_blocked,
        grid=(B // tile,),
        # input block dbl-buffered (11.1M at n_p=104/tile 128) + the single
        # L scratch (5.5M) + consts: grant headroom over the 16M default
        # (v5e VMEM is 128M physical)
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=24 << 20),
        in_specs=[
            pl.BlockSpec((n2, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK * n_p, n_p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BLOCK * n_p, _BLOCK), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_p, tile), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, B), jnp.float32),
        scratch_shapes=[pltpu.VMEM((n2, tile), jnp.float32)],
        interpret=interpret,
    )(M_t, b_t, T8, B8)


@functools.partial(jax.jit, static_argnames=("n", "tile", "interpret"))
def chol_resolve(L_flat: jax.Array, b: jax.Array, n: int, tile: int = 512,
                 interpret: bool = False):
    """Solve M x = b reusing a factor from chol_factor_solve.

    L_flat: (B, n_p*n_p) packed factor; b (B, n). Returns x (B, n).
    """
    B = L_flat.shape[0]
    n_p = int(np.sqrt(L_flat.shape[1]))
    with jax.enable_x64(False):
        bp = jnp.zeros((B, n_p), jnp.float32).at[:, :n].set(b.astype(jnp.float32))
        x_t = _resolve_call(L_flat.T.astype(jnp.float32), bp.T, n_p,
                            _tile_cap(n_p, tile, 1), interpret)
        return x_t[:n, :].T


@functools.partial(jax.jit, static_argnames=("n_p", "tile", "interpret"))
def _resolve_call(L_t, b_t, n_p, tile, interpret):
    B = L_t.shape[1]
    n2 = n_p * n_p

    def kernel(L_ref, b_ref, x_out):
        col = lambda j: L_ref[j * n_p : (j + 1) * n_p, :]
        y = _tri_lower(col, b_ref[:], n_p)
        x_out[:] = (_tri_upper_red(col, y, n_p) if n_p >= 32
                    else _tri_upper_t([col(j) for j in range(n_p)], y, n_p))

    vlim = _vlim_raise(n2, n_p, tile, 1)
    return pl.pallas_call(
        kernel,
        grid=(B // tile,),
        compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=vlim)
                         if vlim else None),
        in_specs=[
            pl.BlockSpec((n2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, B), jnp.float32),
        interpret=interpret,
    )(L_t, b_t)


# ---- shared in-kernel recurrences (lists of (n_p, T) column blocks) ----

_BLOCK = 8  # slab width for the blocked factorization


def _blocked_consts(n_p: int):
    """Constants for the slab-blocked factorization (r4, VERDICT item 2a):
    TILE8 (8*n_p, n_p) replicates a column value 8x vertically via one MXU
    matmul; BC8 (8*n_p, 8) broadcasts 8 per-lane scalars into 8 n_p-row
    blocks. Together one trailing-slab rank-1 update covers 8 target
    columns in 2 ops instead of 8 — the op-count cut that matters in the
    issue-bound regime (measured: the unrolled per-column chol at nz_p=104
    was the DMS flagship's dominant per-iteration cost)."""
    TILE8 = np.tile(np.eye(n_p, dtype=np.float32), (_BLOCK, 1))
    BC8 = np.zeros((_BLOCK * n_p, _BLOCK), np.float32)
    for j in range(_BLOCK):
        BC8[j * n_p:(j + 1) * n_p, j] = 1.0
    return jnp.asarray(TILE8), jnp.asarray(BC8)


def _mxu(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)


def _chol_blocked_inplace(M_rw, n_p, TILE8_ref, BC8_ref):
    """Left-looking blocked Cholesky IN PLACE on the flat (n_p*n_p, T)
    layout: slabs of 8 columns; within-slab columns factor sequentially,
    trailing slabs update with 2 ops per (pivot, slab) pair, all through
    the read-write ref (holding the matrix as live values doubles the
    scoped-VMEM footprint — measured OOM at n_p=104/tile 128). Same math
    as _chol_cols (summation order identical within each column)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_p, 1), 0)
    TILE8 = TILE8_ref[:]
    BC8 = BC8_ref[:]
    nsl = n_p // _BLOCK
    for s in range(nsl):
        Lsl = []
        for jj in range(_BLOCK):
            j = s * _BLOCK + jj
            acc = M_rw[j * n_p:(j + 1) * n_p, :]
            for kk in range(jj):
                acc = acc - Lsl[kk][j:j + 1, :] * Lsl[kk]
            djj = jnp.sqrt(jnp.maximum(acc[j:j + 1, :], 1e-30))
            Lj = jnp.where(rows >= j, acc / djj, 0.0)
            Lsl.append(Lj)
            M_rw[j * n_p:(j + 1) * n_p, :] = Lj
        for kk in range(_BLOCK):
            if s + 1 < nsl:
                tiled = _mxu(TILE8, Lsl[kk])               # (8 n_p, T)
            for s2 in range(s + 1, nsl):
                coef = Lsl[kk][s2 * _BLOCK:(s2 + 1) * _BLOCK, :]
                sl = slice(s2 * _BLOCK * n_p, (s2 + 1) * _BLOCK * n_p)
                M_rw[sl, :] = M_rw[sl, :] - tiled * _mxu(BC8, coef)


def _tri_upper_red(col, y, n_p):
    """Solve L^T x = y by per-column sublane REDUCTIONS: x_j = (y_j -
    sum_k L[k, j] x_k) / L[j, j], where the sum is one masked dot of
    column j with the partially-built x vector (rows < j of Ls[j] are
    zero, and unset x rows are zero, so a full-column reduce is exact).
    ~4 ops per column instead of the O(n_p) inner loop."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_p, 1), 0)
    x = jnp.zeros_like(y)
    for idx in range(n_p):
        j = n_p - 1 - idx
        Lj = col(j)
        dotj = jnp.sum(Lj * x, axis=0, keepdims=True)
        xj = (y[j:j + 1, :] - dotj) / Lj[j:j + 1, :]
        x = x + jnp.where(rows == j, xj, 0.0)
    return x


def _chol_cols(M_ref, n_p):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_p, 1), 0)
    Ls = []
    for j in range(n_p):
        acc = M_ref[j * n_p : (j + 1) * n_p, :]
        for k in range(j):
            acc = acc - Ls[k][j : j + 1, :] * Ls[k]
        djj = jnp.sqrt(jnp.maximum(acc[j : j + 1, :], 1e-30))
        Ls.append(jnp.where(rows >= j, acc / djj, 0.0))
    return Ls


def _tri_lower(col, b, n_p):
    """col: j -> L column j (a value, or a lazy ref load — the blocked
    kernels pass a ref-backed getter so at most one column is live)."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_p, 1), 0)
    y = jnp.zeros_like(b)
    for j in range(n_p):
        Lj = col(j)
        yj = b[j : j + 1, :] / Lj[j : j + 1, :]
        y = y + jnp.where(rows == j, yj, 0.0)
        b = b - jnp.where(rows > j, Lj * yj, 0.0)
    return y


def _tri_upper_t(Ls, y, n_p):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_p, 1), 0)
    xs = [None] * n_p
    for idx in range(n_p):
        j = n_p - 1 - idx
        acc = y[j : j + 1, :]
        for k in range(j + 1, n_p):
            acc = acc - Ls[j][k : k + 1, :] * xs[k]
        xs[j] = acc / Ls[j][j : j + 1, :]
    x = jnp.zeros_like(y)
    for j in range(n_p):
        x = x + jnp.where(rows == j, xs[j], 0.0)
    return x
