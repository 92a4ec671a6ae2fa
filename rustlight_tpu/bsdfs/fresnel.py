"""Fresnel terms, vectorized (reference: src/bsdfs/utils.rs:76-130)."""
from __future__ import annotations

import jax.numpy as jnp

# Named-IOR lookup (reference: src/bsdfs/glass.rs:6-34, the Mitsuba table).
# Scene files may give dielectric IORs by material name
# (<string name="intIOR" value="water"/>); resolve_ior maps either form.
NAMED_IOR = {
    "vacuum": 1.0,
    "helium": 1.000036,
    "hydrogen": 1.000132,
    "air": 1.000277,
    "carbon dioxide": 1.00045,
    "water": 1.3330,
    "acetone": 1.36,
    "ethanol": 1.361,
    "carbon tetrachloride": 1.461,
    "glycerol": 1.4729,
    "benzene": 1.501,
    "silicone oil": 1.52045,
    "bromine": 1.661,
    "water ice": 1.31,
    "fused quartz": 1.458,
    "pyrex": 1.470,
    "acrylic glass": 1.49,
    "polypropylene": 1.49,
    "bk7": 1.5046,
    "sodium chloride": 1.544,
    "amber": 1.55,
    "pet": 1.5750,
    "diamond": 2.419,
}


def resolve_ior(value, default: float) -> float:
    """Numeric string/float -> float; material name -> NAMED_IOR entry
    (case-insensitive, matching glass.rs:6-34); None -> default.

    A non-positive numeric value also falls back to the default: eta <= 0
    divides by zero in fresnel_dielectric and the pre-named-IOR loader
    tolerated `value="0"` via its falsy-or fallback — keep that graceful."""
    if value is None:
        return float(default)
    if isinstance(value, (int, float)):
        return float(value) if value > 0 else float(default)
    s = str(value).strip()
    try:
        v = float(s)
        return v if v > 0 else float(default)
    except ValueError:
        key = s.lower()
        if key not in NAMED_IOR:
            raise ValueError(f"unknown named IOR {s!r} (glass.rs:6-34 "
                             f"table: {sorted(NAMED_IOR)})") from None
        return NAMED_IOR[key]


def fresnel_dielectric(cos_i, eta):
    """Unpolarized dielectric Fresnel.

    cos_i: signed cosine w.r.t. the normal; eta = int_ior/ext_ior.
    Returns (F, cos_theta_t) where cos_theta_t carries the sign convention of
    the reference (negative when entering from the front side).
    """
    eta = jnp.asarray(eta)
    scale = jnp.where(cos_i > 0.0, 1.0 / eta, eta)
    cos_t_sqr = 1.0 - (1.0 - cos_i * cos_i) * scale * scale
    tir = cos_t_sqr <= 0.0

    cos_ia = jnp.abs(cos_i)
    cos_t = jnp.sqrt(jnp.maximum(cos_t_sqr, 0.0))
    rs = (cos_ia - eta * cos_t) / (cos_ia + eta * cos_t)
    rp = (eta * cos_ia - cos_t) / (eta * cos_ia + cos_t)
    f = 0.5 * (rs * rs + rp * rp)
    cos_t_signed = jnp.where(cos_i > 0.0, -cos_t, cos_t)

    f = jnp.where(tir, 1.0, f)
    cos_t_signed = jnp.where(tir, 0.0, cos_t_signed)
    # Index-matched interface: fully transmissive
    transparent = eta == 1.0
    f = jnp.where(transparent, 0.0, f)
    cos_t_signed = jnp.where(transparent, -cos_i, cos_t_signed)
    return f, cos_t_signed


def fresnel_conductor(cos_i, eta, k):
    """Conductor Fresnel; eta/k are [..., 3] RGB, cos_i [...]. Returns [..., 3]."""
    c2 = (cos_i * cos_i)[..., None]
    s2 = 1.0 - c2
    s4 = s2 * s2
    t1 = eta * eta - k * k - s2
    a2pb2 = jnp.sqrt(jnp.maximum(t1 * t1 + 4.0 * k * k * eta * eta, 0.0))
    a = jnp.sqrt(jnp.maximum((a2pb2 + t1) * 0.5, 0.0))
    term1 = a2pb2 + c2
    term2 = a * 2.0 * jnp.sqrt(c2)
    rs2 = (term1 - term2) / (term1 + term2)
    term3 = a2pb2 * c2 + s4
    term4 = term2 * s2
    rp2 = rs2 * (term3 - term4) / (term3 + term4)
    return 0.5 * (rp2 + rs2)


def schlick_fresnel(rs, cos_theta):
    """rs [..., 3], cos_theta [...] -> [..., 3] (reference substrate.rs:15-19)."""
    return rs + (1.0 - rs) * (1.0 - cos_theta[..., None]) ** 5
