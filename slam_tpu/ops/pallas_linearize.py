"""Pallas TPU kernel: fused SE(2) edge linearisation.

The per-iteration hot op is a chain of ~40 small element-wise stages per
edge: trig for both endpoint poses, the closed-form residual, analytic 3x3
Jacobians, DCS scaling with its chain rule, the Huber IRLS weight, and the
weighted block products (Haa, Hbb, Hoff, ga, gb) plus the robust cost terms.
XLA fuses much of this, but materialises several (E,3,3) intermediates whose
tiny trailing dims tile-pad poorly.  This kernel computes the whole chain in
ONE VMEM-resident pass with the edge axis on the 128-wide lane dimension and
all per-edge quantities stacked on the sublane axis:

    input  X (16, Ep):  [pa(3), pb(3), meas(3), free_a, free_b, loop, active,
                         pad(2)]
    output Y (64, Ep):  [e(3), Ja(9), Jb(9), Haa(9), Hbb(9), Hoff(9),
                         ga(3), gb(3), w(1), rho(1), pad...]

Pure VPU arithmetic, one HBM read + one write per edge tile -- the
speed-of-light shape for this op.  Gathers stay outside (incidence matmuls
on the MXU; see ``ops/indexing.py``).

Used by ``solver/linearize.py`` when ``use_pallas`` is enabled (TPU default
for robust modes none/dcs); ``interpret=True`` makes the same kernel run on
CPU for tests.  asin is computed as ``atan2(x, sqrt(1-x^2))`` to stay within
ops Mosaic lowers natively.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_TILE = 512  # edges per grid step (multiple of 128)

# Row layout (input).
_IN_ROWS = 16
# Row layout (output).
_OUT_ROWS = 64


# Mosaic TC lowers sin/cos/sqrt/rsqrt but not asin/atan/atan2; implement
# asin with the libm-style range reduction |z|<=0.5 + odd Taylor series in
# z^2 (11 terms -> ~3e-9 max error, well inside f32).
_ASIN_COEFFS = [
    0.011551800896139708,   # c10 = C(20,10)/(4^10 * 21)
    0.01396480018865411,
    0.017352764423076923,
    0.02237215909090909,
    0.030382254464285716,
    0.04464285714285714,
    0.075,
    0.16666666666666666,
]


def _asin_core(z):
    """asin(z)/z as a polynomial in z^2, valid for |z| <= 0.5."""
    z2 = z * z
    p = jnp.full_like(z, 0.00969123281370640)  # c11 tail guard
    for c in _ASIN_COEFFS:
        p = p * z2 + c
    return z * (p * z2 + 1.0)


def _asin(x):
    ax = jnp.abs(x)
    big = ax > 0.5
    inner = jnp.sqrt(jnp.maximum((1.0 - ax) * 0.5, 0.0))
    res = jnp.where(
        big,
        jnp.pi / 2 - 2.0 * _asin_core(inner),
        _asin_core(jnp.minimum(ax, 0.5)),
    )
    return jnp.sign(x) * res


def _kernel(phi_delta_ref, x_ref, y_ref, *, robust: str):
    phi = phi_delta_ref[0]
    delta = phi_delta_ref[1]

    x = x_ref[:]
    pa_x, pa_y, pa_t = x[0], x[1], x[2]
    pb_x, pb_y, pb_t = x[3], x[4], x[5]
    m_x, m_y, m_t = x[6], x[7], x[8]
    fa, fb = x[9], x[10]
    loop_f, active = x[11], x[12]

    ca = jnp.cos(pa_t)
    sa = jnp.sin(pa_t)
    cm = jnp.cos(m_t)
    sm = jnp.sin(m_t)
    dx = pb_x - pa_x
    dy = pb_y - pa_y

    vx = ca * dx + sa * dy - m_x
    vy = -sa * dx + ca * dy - m_y
    e0 = cm * vx + sm * vy
    e1 = -sm * vx + cm * vy
    dt = pb_t - pa_t - m_t
    sdt = jnp.clip(jnp.sin(dt), -1.0, 1.0)
    e2 = _asin(sdt)

    cma = jnp.cos(m_t + pa_t)
    sma = jnp.sin(m_t + pa_t)
    gx = -sa * dx + ca * dy
    gy = -ca * dx - sa * dy
    ht_x = cm * gx + sm * gy
    ht_y = -sm * gx + cm * gy
    sgn = jnp.sign(jnp.cos(dt))

    zero = jnp.zeros_like(e0)
    # Ja rows (row-major [de_i/dxa, de_i/dya, de_i/dta]) with gauge masking.
    ja = [
        -cma * fa, -sma * fa, ht_x * fa,
        sma * fa, -cma * fa, ht_y * fa,
        zero, zero, -sgn * fa,
    ]
    jb = [
        cma * fb, sma * fb, zero,
        -sma * fb, cma * fb, zero,
        zero, zero, sgn * fb,
    ]
    e = [e0, e1, e2]

    if robust == "dcs":
        r2 = e0 * e0 + e1 * e1
        psi_raw = jnp.sqrt(2.0 * phi / (phi + r2))
        act = psi_raw < 1.0
        psi = jnp.where(act, psi_raw, 1.0)
        dpsi = jnp.where(act, -psi / (2.0 * (phi + r2)), 0.0)
        # blend: apply on loop edges only.
        psi = loop_f * psi + (1.0 - loop_f)
        dpsi = loop_f * dpsi

        def scale(jrows):
            out = []
            for i in range(3):
                # dr2/dx_j = 2*(e0*J[0,j] + e1*J[1,j])
                for j in range(3):
                    dr = 2.0 * (e0 * jrows[0 * 3 + j] + e1 * jrows[1 * 3 + j])
                    out.append(psi * jrows[i * 3 + j] + e[i] * dpsi * dr)
            return out

        ja = scale(ja)
        jb = scale(jb)
        e = [psi * e0, psi * e1, psi * e2]

    s2 = e[0] * e[0] + e[1] * e[1] + e[2] * e[2]
    d2 = delta * delta
    safe = jnp.sqrt(jnp.maximum(s2, d2))
    w = jnp.where(s2 <= d2, jnp.ones_like(s2), delta / safe) * active
    rho = jnp.where(s2 <= d2, s2, 2.0 * delta * safe - d2) * active

    rows = []
    rows.extend(e)                                    # 0:3
    rows.extend(ja)                                   # 3:12
    rows.extend(jb)                                   # 12:21
    for i in range(3):                                # Haa 21:30
        for j in range(3):
            rows.append(
                w * (ja[0 * 3 + i] * ja[0 * 3 + j]
                     + ja[1 * 3 + i] * ja[1 * 3 + j]
                     + ja[2 * 3 + i] * ja[2 * 3 + j])
            )
    for i in range(3):                                # Hbb 30:39
        for j in range(3):
            rows.append(
                w * (jb[0 * 3 + i] * jb[0 * 3 + j]
                     + jb[1 * 3 + i] * jb[1 * 3 + j]
                     + jb[2 * 3 + i] * jb[2 * 3 + j])
            )
    for i in range(3):                                # Hoff 39:48
        for j in range(3):
            rows.append(
                w * (ja[0 * 3 + i] * jb[0 * 3 + j]
                     + ja[1 * 3 + i] * jb[1 * 3 + j]
                     + ja[2 * 3 + i] * jb[2 * 3 + j])
            )
    for i in range(3):                                # ga 48:51
        rows.append(
            w * (ja[0 * 3 + i] * e[0] + ja[1 * 3 + i] * e[1]
                 + ja[2 * 3 + i] * e[2])
        )
    for i in range(3):                                # gb 51:54
        rows.append(
            w * (jb[0 * 3 + i] * e[0] + jb[1 * 3 + i] * e[1]
                 + jb[2 * 3 + i] * e[2])
        )
    rows.append(w)                                    # 54
    rows.append(rho)                                  # 55
    while len(rows) < _OUT_ROWS:
        rows.append(zero)
    y_ref[:] = jnp.stack(rows, axis=0)


@functools.partial(
    jax.jit, static_argnames=("robust", "interpret")
)
def fused_linearize_se2(
    pa, pb, meas, free_a, free_b, loop_f, active,
    phi: float, delta: float,
    robust: str = "none",
    interpret: bool = False,
):
    """Run the fused kernel; returns a dict of per-edge arrays.

    All inputs are (E,) / (E,3); E is padded internally to the lane tile.
    Returns e (E,3), Ja/Jb/Haa/Hbb/Hoff (E,3,3), ga/gb (E,3), w (E,),
    rho (E,) -- identical semantics to the XLA path in solver/linearize.py
    (tested equal).
    """
    E = pa.shape[0]
    dtype = pa.dtype
    Ep = -(-E // LANE_TILE) * LANE_TILE

    def pad(v):
        return jnp.pad(v, [(0, Ep - E)] + [(0, 0)] * (v.ndim - 1))

    x = jnp.zeros((_IN_ROWS, Ep), dtype)
    x = x.at[0:3].set(pad(pa).T)
    x = x.at[3:6].set(pad(pb).T)
    x = x.at[6:9].set(pad(meas).T)
    x = x.at[9].set(pad(free_a))
    x = x.at[10].set(pad(free_b))
    x = x.at[11].set(pad(loop_f))
    x = x.at[12].set(pad(active))

    phi_delta = jnp.asarray([phi, delta], dtype)

    y = pl.pallas_call(
        functools.partial(_kernel, robust=robust),
        grid=(Ep // LANE_TILE,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (_IN_ROWS, LANE_TILE),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (_OUT_ROWS, LANE_TILE),
            lambda i: (0, i),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((_OUT_ROWS, Ep), dtype),
        interpret=interpret,
    )(phi_delta, x)

    y = y[:, :E]

    def blocks(lo):
        return y[lo : lo + 9].T.reshape(E, 3, 3)

    return {
        "e": y[0:3].T,
        "Ja": blocks(3),
        "Jb": blocks(12),
        "Haa": blocks(21),
        "Hbb": blocks(30),
        "Hoff": blocks(39),
        "ga": y[48:51].T,
        "gb": y[51:54].T,
        "w": y[54],
        "rho": y[55],
    }
