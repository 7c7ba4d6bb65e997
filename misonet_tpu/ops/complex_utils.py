"""Complex contraction helpers.

The TPU backend in this environment does not implement complex
``dot_general`` (UNIMPLEMENTED at compile time), and the MXU is a real
systolic array anyway — so every complex einsum in the framework routes
through :func:`ceinsum`, which expands (A+iB)(C+iD) into four real
contractions with fp32 accumulation.  Elementwise complex arithmetic (mul,
abs, exp, fft) lowers fine and is left untouched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def to_host(x) -> "np.ndarray":
    """Complex-safe device->host fetch.

    The axon TPU runtime cannot transfer complex64 buffers (UNIMPLEMENTED),
    so complex arrays are fetched as two real transfers and recombined."""
    import numpy as np

    if jnp.iscomplexobj(x):
        return np.asarray(jnp.real(x)) + 1j * np.asarray(jnp.imag(x))
    return np.asarray(x)


def to_device(x) -> jnp.ndarray:
    """Complex-safe host->device put (two real transfers + lax.complex)."""
    import numpy as np

    x = np.asarray(x)
    if np.iscomplexobj(x):
        return jax.lax.complex(
            jnp.asarray(np.ascontiguousarray(x.real)),
            jnp.asarray(np.ascontiguousarray(x.imag)),
        )
    return jnp.asarray(x)


def ceinsum(subscripts: str, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """jnp.einsum for two complex operands via real decomposition.

    Handles real/complex mixes too; conjugate an operand at the call site
    (conj is elementwise and cheap)."""
    a_c = jnp.iscomplexobj(a)
    b_c = jnp.iscomplexobj(b)
    if not (a_c or b_c):
        return jnp.einsum(subscripts, a, b, preferred_element_type=jnp.float32)

    ar = jnp.real(a) if a_c else a
    ai = jnp.imag(a) if a_c else None
    br = jnp.real(b) if b_c else b
    bi = jnp.imag(b) if b_c else None

    def e(x, y):
        return jnp.einsum(subscripts, x, y, preferred_element_type=jnp.float32)

    rr = e(ar, br)
    if a_c and b_c:
        re = rr - e(ai, bi)
        im = e(ar, bi) + e(ai, br)
    elif a_c:
        re = rr
        im = e(ai, br)
    else:
        re = rr
        im = e(ar, bi)
    return jax.lax.complex(re, im)
