"""Pallas TPU kernel: batched small Hermitian solve for MVDR weights.

The MVDR stage solves (Phi_n + delta*I) x = d for ~B*F independent M x M
(M = number of mics, 6) complex Hermitian PD systems (reference
tester.py:777-791 does this with LAPACK gesv on the host).  Stock XLA
handles complex LU on TPU by decomposing through generic batched linalg,
which wastes the vector unit: each 6x6 system occupies a 128-lane register
almost empty.

This kernel turns the batch axis into the vector axis instead: matrices are
laid out [M, M, N] with N (the B*F systems) riding the (sublane, lane)
tiles, and an unrolled complex Cholesky -> forward/back substitution runs as
~100 fully-dense VPU ops on [TN]-shaped vectors.  M is a compile-time
constant so the whole factorization is straight-line code.

Complex arithmetic is explicit re/im fp32 pairs (TPU Pallas has no native
complex dtype).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Systems per grid step: 64 sublanes x 128 lanes of fp32.
_TN = 8192


def _solve_kernel(m: int, diag: float, rr, ri, dr, di, wr, wi):
    """One grid step: solve (R + diag*I) x = d for TN systems.

    rr/ri: [M, M, TN] Hermitian matrix re/im;  dr/di: [M, TN] rhs;
    wr/wi: [M, TN] outputs (the normalized MVDR weight numerator/denominator
    division happens outside — this returns x and the caller normalizes)."""
    # ---- Cholesky: R + diag*I = L L^H (unrolled, complex) -------------
    lr: dict[tuple[int, int], jnp.ndarray] = {}
    li: dict[tuple[int, int], jnp.ndarray] = {}
    inv_diag: dict[int, jnp.ndarray] = {}
    for j in range(m):
        ajj = rr[j, j, :] + diag
        for k in range(j):
            ajj = ajj - (lr[(j, k)] ** 2 + li[(j, k)] ** 2)
        ljj = jnp.sqrt(jnp.maximum(ajj, 1e-30))
        inv_j = 1.0 / ljj
        lr[(j, j)] = ljj
        li[(j, j)] = jnp.zeros_like(ljj)
        inv_diag[j] = inv_j
        for i in range(j + 1, m):
            sr = rr[i, j, :]
            si = ri[i, j, :]
            for k in range(j):
                # s -= L[i,k] * conj(L[j,k])
                sr = sr - (lr[(i, k)] * lr[(j, k)] + li[(i, k)] * li[(j, k)])
                si = si - (li[(i, k)] * lr[(j, k)] - lr[(i, k)] * li[(j, k)])
            lr[(i, j)] = sr * inv_j
            li[(i, j)] = si * inv_j

    # ---- forward substitution: L y = d --------------------------------
    yr: dict[int, jnp.ndarray] = {}
    yi: dict[int, jnp.ndarray] = {}
    for j in range(m):
        sr = dr[j, :]
        si = di[j, :]
        for k in range(j):
            sr = sr - (lr[(j, k)] * yr[k] - li[(j, k)] * yi[k])
            si = si - (lr[(j, k)] * yi[k] + li[(j, k)] * yr[k])
        yr[j] = sr * inv_diag[j]
        yi[j] = si * inv_diag[j]

    # ---- back substitution: L^H x = y ---------------------------------
    xr: dict[int, jnp.ndarray] = {}
    xi: dict[int, jnp.ndarray] = {}
    for i in range(m - 1, -1, -1):
        sr = yr[i]
        si = yi[i]
        for k in range(i + 1, m):
            # s -= conj(L[k,i]) * x[k]
            sr = sr - (lr[(k, i)] * xr[k] + li[(k, i)] * xi[k])
            si = si - (lr[(k, i)] * xi[k] - li[(k, i)] * xr[k])
        xr[i] = sr * inv_diag[i]
        xi[i] = si * inv_diag[i]

    for j in range(m):
        wr[j, :] = xr[j]
        wi[j, :] = xi[j]


@functools.partial(jax.jit, static_argnames=("diag",))
def hermitian_solve_pallas(
    r: jnp.ndarray, d: jnp.ndarray, diag: float = 1e-6
) -> jnp.ndarray:
    """Solve (R + diag*I) x = d for batched Hermitian PD systems.

    r: complex64 [..., M, M];  d: complex64 [..., M]  ->  x [..., M].
    Drop-in for ``jnp.linalg.solve(R + diag*I, d)`` on the MVDR path."""
    batch_shape = r.shape[:-2]
    m = r.shape[-1]
    n = 1
    for s in batch_shape:
        n *= s

    # [..., M, M] -> [M, M, N] re/im, pad N to the tile size.
    rr = jnp.moveaxis(r.reshape(n, m, m), 0, -1)
    dd = jnp.moveaxis(d.reshape(n, m), 0, -1)
    n_pad = (-n) % _TN
    if n_pad:
        rr = jnp.pad(rr, [(0, 0), (0, 0), (0, n_pad)])
        dd = jnp.pad(dd, [(0, 0), (0, n_pad)])
    n_tot = n + n_pad

    grid = (n_tot // _TN,)
    spec_m = pl.BlockSpec((m, m, _TN), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
    spec_v = pl.BlockSpec((m, _TN), lambda i: (0, i), memory_space=pltpu.VMEM)

    wr, wi = pl.pallas_call(
        functools.partial(_solve_kernel, m, diag),
        grid=grid,
        in_specs=[spec_m, spec_m, spec_v, spec_v],
        out_specs=[spec_v, spec_v],
        out_shape=[
            jax.ShapeDtypeStruct((m, n_tot), jnp.float32),
            jax.ShapeDtypeStruct((m, n_tot), jnp.float32),
        ],
    )(
        jnp.real(rr).astype(jnp.float32),
        jnp.imag(rr).astype(jnp.float32),
        jnp.real(dd).astype(jnp.float32),
        jnp.imag(dd).astype(jnp.float32),
    )
    x = jax.lax.complex(wr[:, :n], wi[:, :n])           # [M, N]
    return jnp.moveaxis(x, -1, 0).reshape(*batch_shape, m)
