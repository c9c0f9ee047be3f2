"""Celestial projection math (FITS WCS Paper II, Calabretta & Greisen 2002).

The reference library delegates all of this to astropy's wcslib C wrapper;
this framework implements the projections it needs natively, as vectorized
numpy on the host and as pure-jnp functions usable inside jit on device
(see :func:`make_pix2world_fn`).

Supported codes: TAN, SIN (incl. slant orthographic with PV2_1=xi,
PV2_2=eta — the radio-interferometry / AIPS NCP case), ARC, STG, ZEA,
AZP (PV2_1=mu, PV2_2=gamma tilt), ZPN (zenithal polynomial PV2_0..PV2_29),
CAR, CEA (PV2_1=lambda), MER, MOL, SFL/GLS, AIT, CYP (PV2_1=mu,
PV2_2=lambda), PAR, the pseudoconics BON (PV2_1=theta_1) and PCO, and the
conic family COP/COE/COD/COO (PV2_1=theta_a, PV2_2=eta).  All functions
work on *intermediate world coordinates* (x, y) in **degrees** and native
spherical coordinates (phi, theta) in **degrees**, matching wcslib
conventions.  ``pv`` holds the PVi_m values of the latitude axis: either a
tuple indexed by m-1 (m >= 1) or a dict ``{m: value}`` (which can carry
m=0, needed by ZPN).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "SUPPORTED_PROJECTIONS",
    "proj_xy2native",
    "proj_native2xy",
    "native_to_celestial",
    "celestial_to_native",
    "celestial_pole",
]

D2R = np.pi / 180.0
R2D = 180.0 / np.pi

SUPPORTED_PROJECTIONS = ("TAN", "SIN", "ARC", "STG", "ZEA", "AZP", "ZPN",
                         "CAR", "CEA", "MER", "MOL", "SFL", "GLS", "AIT",
                         "CYP", "PAR", "BON", "PCO",
                         "COP", "COE", "COD", "COO", "")

# Fiducial native coordinates (phi0, theta0) per projection family [deg].
_ZENITHAL = {"TAN", "SIN", "ARC", "STG", "ZEA", "AZP", "ZPN"}
_CYLINDRICAL = {"CAR", "CEA", "MER", "MOL", "SFL", "GLS", "AIT",
                "CYP", "PAR", "BON", "PCO", ""}
_CONIC = {"COP", "COE", "COD", "COO"}


def _pv(pv, m, default):
    if isinstance(pv, dict):
        v = pv.get(m)
        return default if v is None else float(v)
    try:
        v = pv[m - 1]
    except (IndexError, TypeError):
        return default
    return default if v is None else float(v)


def _zpn_coeffs(pv):
    """ZPN polynomial coefficients P_0..P_K as a list (PV2_m, m=0..29)."""
    if isinstance(pv, dict):
        ms = [m for m in pv if pv[m] is not None]
    else:
        ms = [m + 1 for m, v in enumerate(pv) if v is not None]
    k = max(ms, default=0)
    coeffs = [_pv(pv, m, 0.0) for m in range(k + 1)]
    if not any(coeffs):
        raise ValueError("ZPN requires at least one nonzero PV2_m "
                         "coefficient")
    return coeffs


def fiducial_native(code: str, pv=()):
    if code in _ZENITHAL:
        return 0.0, 90.0
    if code in _CONIC:
        # conics put the fiducial point on the middle parallel theta_a
        return 0.0, _pv(pv, 1, 0.0)
    return 0.0, 0.0


def _conic_params(code, pv, xp):
    """(C, R(theta) [deg], Y0 [deg]) for the conic family, derived from
    the two standard parallels theta_1,2 = theta_a -+ eta (PV2_1, PV2_2):

    - COP: perspective projection onto the cone tangent at theta_a,
      scaled by cos(eta) (secant-cone convention),
    - COE: equal-area (Albers): C and R from dA_map == dA_sphere plus
      true scale at both standard parallels,
    - COD: equidistant: |dR/dtheta| == 1 plus true scale at both,
    - COO: conformal (Lambert): s_par == s_mer plus true scale at both.

    Returns (C, R(theta_deg)->deg, Rinv(R_deg)->theta_deg, Y0).
    """
    ta = _pv(pv, 1, 0.0)
    eta = _pv(pv, 2, 0.0)
    ta_r, eta_r = ta * D2R, eta * D2R
    t1, t2 = ta_r - eta_r, ta_r + eta_r
    if code == "COP":
        C = np.sin(ta_r)
        cot_a = 1.0 / np.tan(ta_r)

        def R(theta):
            t = theta * D2R
            return R2D * np.cos(eta_r) * (cot_a - xp.tan(t - ta_r))

        def Rinv(r):
            return ta + xp.arctan(cot_a - r * D2R / np.cos(eta_r)) * R2D
    elif code == "COE":
        gamma = np.sin(t1) + np.sin(t2)
        C = gamma / 2.0
        s1s2 = np.sin(t1) * np.sin(t2)

        def R(theta):
            t = theta * D2R
            return (2.0 * R2D / gamma) * xp.sqrt(
                xp.maximum(1.0 + s1s2 - gamma * xp.sin(t), 0.0))

        def Rinv(r):
            sin_t = (1.0 + s1s2 - (gamma * r * D2R / 2.0) ** 2) / gamma
            return xp.arcsin(xp.clip(sin_t, -1.0, 1.0)) * R2D
    elif code == "COD":
        if eta == 0.0:
            C = np.sin(ta_r)
            R0 = R2D * np.cos(ta_r) / np.sin(ta_r)
        else:
            C = np.sin(ta_r) * np.sin(eta_r) / eta_r
            R0 = eta * np.cos(ta_r) * np.cos(eta_r) / (np.sin(ta_r)
                                                       * np.sin(eta_r))

        def R(theta):
            return R0 + (ta - theta)

        def Rinv(r):
            return ta + R0 - r
    elif code == "COO":
        c1, c2 = np.cos(t1), np.cos(t2)
        tan1 = np.tan((np.pi / 2 - t1) / 2.0)
        tan2 = np.tan((np.pi / 2 - t2) / 2.0)
        if eta == 0.0 or abs(tan1 - tan2) < 1e-14:
            C = np.sin(ta_r)
        else:
            C = np.log(c2 / c1) / np.log(tan2 / tan1)
        psi = R2D * c1 / (C * tan1 ** C)

        def R(theta):
            t = theta * D2R
            return psi * xp.tan((np.pi / 2 - t) / 2.0) ** C

        def Rinv(r):
            return 90.0 - 2.0 * xp.arctan(
                xp.maximum(r / psi, 0.0) ** (1.0 / C)) * R2D
    else:
        raise ValueError(f"not a conic: {code!r}")
    # fiducial point (0, theta_a) maps to (x, y) = (0, 0)
    Y0 = float(np.asarray(R(np.float64(ta))))
    return C, R, Rinv, Y0


def _zenithal_r_to_theta(code, r, xp, pv=()):
    """R_theta [deg] -> theta [deg] for radially-symmetric zenithals
    (AZP and slant SIN are handled separately: their (x, y) maps are not
    radially symmetric once the PV obliquity parameters are nonzero)."""
    if code == "ZPN":
        return _zpn_r_to_theta(r, xp, pv)
    if code == "TAN":
        return xp.arctan2(R2D, r) * R2D
    if code == "SIN":
        return xp.arccos(xp.clip(r * D2R, -1.0, 1.0)) * R2D
    if code == "ARC":
        return 90.0 - r
    if code == "STG":
        return 90.0 - 2.0 * xp.arctan(r * D2R / 2.0) * R2D
    if code == "ZEA":
        return 90.0 - 2.0 * xp.arcsin(xp.clip(r * D2R / 2.0, -1.0, 1.0)) * R2D
    raise ValueError(f"unsupported zenithal projection {code!r}")


def _zenithal_theta_to_r(code, theta, xp, pv=()):
    t = theta * D2R
    if code == "ZPN":
        coeffs = _zpn_coeffs(pv)
        zeta = (np.pi / 2.0) - t
        r = coeffs[-1] * xp.ones_like(zeta) if len(coeffs) > 1 \
            else coeffs[-1]
        for c in coeffs[-2::-1]:
            r = r * zeta + c
        return R2D * r
    if code == "TAN":
        return R2D * xp.cos(t) / xp.maximum(xp.sin(t), 1e-300)
    if code == "SIN":
        return R2D * xp.cos(t)
    if code == "ARC":
        return 90.0 - theta
    if code == "STG":
        return 2.0 * R2D * xp.tan((np.pi / 2.0 - t) / 2.0)
    if code == "ZEA":
        return 2.0 * R2D * xp.sin((np.pi / 2.0 - t) / 2.0)
    raise ValueError(f"unsupported zenithal projection {code!r}")


def _zpn_r_to_theta(r, xp, pv):
    """ZPN inverse: solve sum_k P_k zeta^k = r [rad] for zeta = 90 - theta
    by Newton iteration (fixed count, jit-friendly).  The polynomial is
    monotonic over the domain of any sane ZPN header (wcslib validates the
    same way by locating the first turning point)."""
    coeffs = _zpn_coeffs(pv)
    target = r * D2R

    def poly_and_deriv(z):
        p = coeffs[-1] * xp.ones_like(z) if len(coeffs) > 1 else coeffs[-1]
        dp = xp.zeros_like(z)
        for c in coeffs[-2::-1]:
            dp = dp * z + p
            p = p * z + c
        return p, dp

    # start from the linear-term estimate (P1 ~ 1 for real headers), or
    # the target itself when P1 is degenerate
    p1 = coeffs[1] if len(coeffs) > 1 else 0.0
    z = (target - coeffs[0]) / p1 if p1 != 0.0 else target
    z = xp.clip(xp.asarray(z, dtype=xp.float64 if xp is np else None),
                0.0, np.pi)
    for _ in range(40):
        f, df = poly_and_deriv(z)
        step = (f - target) / xp.where(xp.abs(df) > 1e-14, df, 1e-14)
        z = xp.clip(z - step, 0.0, np.pi)
    return 90.0 - z * R2D


def _azp_native2xy(phi, theta, xp, pv):
    """AZP forward incl. the tilted-projector gamma (Calabretta & Greisen
    2002 eq. 20-21): perspective from (0, 0, -mu) onto the plane through
    (0, 0, 1) tilted by gamma about the native x = cos(theta)cos(phi)
    direction."""
    mu = _pv(pv, 1, 0.0)
    gam = _pv(pv, 2, 0.0) * D2R
    t, p = theta * D2R, phi * D2R
    ct, st = xp.cos(t), xp.sin(t)
    denom = mu + st + ct * xp.cos(p) * np.tan(gam)
    rr = R2D * (mu + 1.0) * ct / denom
    return rr * xp.sin(p), -rr * xp.cos(p) / np.cos(gam)


def _azp_xy2native(x, y, xp, pv):
    """AZP inverse as an exact ray-sphere intersection: the plane point of
    (x, y) is joined to the projector at (0, 0, -mu) and intersected with
    the unit sphere, taking the intersection nearer the native pole
    (wcslib's branch convention).  Handles mu = 0 and nonzero gamma
    uniformly."""
    mu = _pv(pv, 1, 0.0)
    gam = _pv(pv, 2, 0.0) * D2R
    xr, yr = x * D2R, y * D2R
    # plane point (0,0,1) + xr*e1 - yr*e2, e1=(0,1,0), e2=(cos g, 0, -sin g)
    # => ray direction d from the projector (0, 0, -mu):
    dx = -yr * np.cos(gam)
    dy = xr
    dz = 1.0 + mu + yr * np.sin(gam)
    d2 = dx * dx + dy * dy + dz * dz
    # |(0,0,-mu) + t d|^2 = 1
    disc = mu * mu * dz * dz - d2 * (mu * mu - 1.0)
    t = (mu * dz + xp.sqrt(xp.maximum(disc, 0.0))) / d2
    xu, yu, zu = t * dx, t * dy, t * dz - mu
    phi = xp.arctan2(yu, xu) * R2D
    theta = xp.arctan2(zu, xp.sqrt(xu * xu + yu * yu)) * R2D
    return phi, theta


def _sin_native2xy(phi, theta, xp, pv):
    """Slant orthographic (SIN with PV2_1 = xi, PV2_2 = eta): orthographic
    projection along the direction (-eta, xi, 1) — the AIPS NCP geometry
    when xi = 0, eta = cot(delta_0)."""
    xi, eta = _pv(pv, 1, 0.0), _pv(pv, 2, 0.0)
    t, p = theta * D2R, phi * D2R
    ct, w = xp.cos(t), 1.0 - xp.sin(t)
    x = R2D * (ct * xp.sin(p) + xi * w)
    y = -R2D * (ct * xp.cos(p) - eta * w)
    return x, y


def _sin_xy2native(x, y, xp, pv):
    """Slant orthographic inverse: with X = x rad, Y = y rad and
    w = 1 - sin(theta), the forward map gives the quadratic
    (xi^2+eta^2+1) w^2 - 2 (xi X + eta Y + 1) w + (X^2+Y^2) = 0, solved
    in the cancellation-free form w = C / (B + sqrt(B^2 - A C))."""
    xi, eta = _pv(pv, 1, 0.0), _pv(pv, 2, 0.0)
    X, Y = x * D2R, y * D2R
    A = xi * xi + eta * eta + 1.0
    B = xi * X + eta * Y + 1.0
    C = X * X + Y * Y
    w = C / (B + xp.sqrt(xp.maximum(B * B - A * C, 0.0)))
    # theta via atan2(sin, cos) with cos^2 = w (2 - w): arcsin(1 - w) would
    # lose half the float64 digits near the pole (w -> 0)
    theta = xp.arctan2(1.0 - w,
                       xp.sqrt(xp.maximum(w * (2.0 - w), 0.0))) * R2D
    phi = xp.arctan2(X - xi * w, -(Y - eta * w)) * R2D
    return phi, theta


def _theta_cot_theta(t, xp):
    """theta * cot(theta), smooth through theta = 0."""
    small = xp.abs(t) < 1e-4
    safe = xp.where(small, 1.0, t)
    return xp.where(small, 1.0 - t * t / 3.0,
                    safe * xp.cos(safe) / xp.sin(safe))


def _pco_theta_from_xy(xr, yr, xp):
    """PCO inverse latitude: the point lies on the parallel's arc
    xr^2 + (t + cot t - yr)^2 = cot^2 t.  Multiplying by t removes the
    pole at t = 0 without introducing a spurious root:
    g(t) = t (xr^2 + (t - yr)^2) + 2 (t cot t) (t - yr) = 0."""
    t = yr
    for _ in range(50):
        tc = _theta_cot_theta(t, xp)
        # d(t cot t)/dt, smooth through 0 (series: -2t/3 - 4t^3/45)
        small = xp.abs(t) < 1e-4
        safe = xp.where(small, 1.0, t)
        s = xp.sin(safe)
        dtc = xp.where(small, -2.0 * t / 3.0,
                       xp.cos(safe) / s - safe / (s * s))
        dy = t - yr
        g = t * (xr * xr + dy * dy) + 2.0 * tc * dy
        dg = xr * xr + dy * dy + 2.0 * t * dy + 2.0 * dtc * dy + 2.0 * tc
        t = t - g / xp.where(xp.abs(dg) > 1e-14, dg, 1e-14)
        t = xp.clip(t, -np.pi / 2 + 1e-12, np.pi / 2 - 1e-12)
    return t


def _mol_gamma_from_theta(theta, xp):
    """Solve 2g + sin 2g = pi sin(theta) by Newton iteration (Mollweide
    forward auxiliary angle; wcslib prjs2x MOL)."""
    t = theta * D2R
    target = np.pi * xp.sin(t)
    g = t  # good starting point; df >= 0 everywhere
    for _ in range(20):
        f = 2.0 * g + xp.sin(2.0 * g) - target
        df = 2.0 + 2.0 * xp.cos(2.0 * g)
        g = g - f / xp.maximum(df, 1e-9)
    # at the exact poles Newton stalls (df -> 0); the solution is +-pi/2
    g = xp.where(xp.abs(target) >= np.pi - 1e-14,
                 xp.sign(target) * (np.pi / 2.0), g)
    return g


def proj_xy2native(code: str, x, y, xp=np, pv=()):
    """(x, y) [deg] -> native (phi, theta) [deg]."""
    code = code.upper()
    if code == "AZP":
        return _azp_xy2native(x, y, xp, pv)
    if code == "SIN" and (_pv(pv, 1, 0.0) != 0.0 or _pv(pv, 2, 0.0) != 0.0):
        return _sin_xy2native(x, y, xp, pv)
    if code in _ZENITHAL:
        r = xp.sqrt(x * x + y * y)
        phi = xp.arctan2(x, -y) * R2D
        theta = _zenithal_r_to_theta(code, r, xp, pv=pv)
        return phi, theta
    if code in _CONIC:
        C, Rfn, Rinv, Y0 = _conic_params(code, pv, xp)
        ta = _pv(pv, 1, 0.0)
        sgn = 1.0 if ta >= 0 else -1.0
        dy = Y0 - y
        r = sgn * xp.sqrt(x * x + dy * dy)
        phi = xp.arctan2(x / r, dy / r) * R2D / C
        return phi, Rinv(r)
    if code in ("CAR", ""):
        return x, y
    if code == "CEA":
        lam = _pv(pv, 1, 1.0)
        theta = xp.arcsin(xp.clip(lam * y * D2R, -1.0, 1.0)) * R2D
        return x, theta
    if code == "MER":
        theta = 2.0 * xp.arctan(xp.exp(y * D2R)) * R2D - 90.0
        return x, theta
    if code == "MOL":
        g = xp.arcsin(xp.clip(y * D2R / np.sqrt(2.0), -1.0, 1.0))
        theta = xp.arcsin(
            xp.clip((2.0 * g + xp.sin(2.0 * g)) / np.pi, -1.0, 1.0)) * R2D
        cg = xp.cos(g)
        phi = np.pi * x / (2.0 * np.sqrt(2.0)) / xp.maximum(cg, 1e-12)
        return phi, theta
    if code in ("SFL", "GLS"):
        return x / xp.cos(y * D2R), y
    if code == "AIT":
        xr, yr = x * D2R, y * D2R
        z2 = 1.0 - (xr / 4.0) ** 2 - (yr / 2.0) ** 2
        z = xp.sqrt(xp.maximum(z2, 0.0))
        theta = xp.arcsin(xp.clip(yr * z, -1.0, 1.0)) * R2D
        phi = 2.0 * xp.arctan2(z * xr / 2.0, 2.0 * z2 - 1.0) * R2D
        return phi, theta
    if code == "CYP":
        mu = _pv(pv, 1, 1.0)
        lam = _pv(pv, 2, 1.0)
        eta = y * D2R / (mu + lam)
        theta = xp.arctan2(eta, xp.ones_like(eta)) + xp.arcsin(
            xp.clip(eta * mu / xp.sqrt(eta * eta + 1.0), -1.0, 1.0))
        return x / lam, theta * R2D
    if code == "PAR":
        s = xp.clip(y / 180.0, -1.0, 1.0)
        theta = 3.0 * xp.arcsin(s) * R2D
        return x / (1.0 - 4.0 * s * s), theta
    if code == "BON":
        t1 = _pv(pv, 1, 0.0)
        if t1 == 0.0:
            return x / xp.cos(y * D2R), y  # degenerates to SFL
        t1r = t1 * D2R
        c = 1.0 / np.tan(t1r) + t1r
        sgn = 1.0 if t1 > 0 else -1.0
        xr, dy = x * D2R, c - y * D2R
        rho = sgn * xp.sqrt(xr * xr + dy * dy)
        theta_r = c - rho
        E = xp.arctan2(xr / rho, dy / rho)
        phi = rho * E / xp.cos(theta_r)
        return phi * R2D, theta_r * R2D
    if code == "PCO":
        xr, yr = x * D2R, y * D2R
        t = _pco_theta_from_xy(xr, yr, xp)
        tc = _theta_cot_theta(t, xp)
        # E from the arc geometry; phi = E / sin(theta), -> x/theta->0
        small = xp.abs(t) < 1e-7
        safe = xp.where(small, 1.0, t)
        cot = tc / safe
        E = xp.arctan2(xr / cot, (safe + cot - yr) / cot)
        phi = xp.where(small, x, E / xp.sin(safe) * R2D)
        return phi, t * R2D
    raise ValueError(f"unsupported projection {code!r}")


def proj_native2xy(code: str, phi, theta, xp=np, pv=()):
    """native (phi, theta) [deg] -> (x, y) [deg]."""
    code = code.upper()
    if code == "AZP":
        return _azp_native2xy(phi, theta, xp, pv)
    if code == "SIN" and (_pv(pv, 1, 0.0) != 0.0 or _pv(pv, 2, 0.0) != 0.0):
        return _sin_native2xy(phi, theta, xp, pv)
    if code in _ZENITHAL:
        r = _zenithal_theta_to_r(code, theta, xp, pv=pv)
        p = phi * D2R
        return r * xp.sin(p), -r * xp.cos(p)
    if code in _CONIC:
        C, Rfn, _, Y0 = _conic_params(code, pv, xp)
        r = Rfn(theta)
        pc = C * phi * D2R
        return r * xp.sin(pc), -r * xp.cos(pc) + Y0
    if code in ("CAR", ""):
        return phi, theta
    if code == "CEA":
        lam = _pv(pv, 1, 1.0)
        return phi, R2D * xp.sin(theta * D2R) / lam
    if code == "MER":
        t = theta * D2R
        return phi, R2D * xp.log(xp.tan((np.pi / 2.0 + t) / 2.0))
    if code == "MOL":
        g = _mol_gamma_from_theta(theta, xp)
        x = 2.0 * np.sqrt(2.0) / np.pi * phi * xp.cos(g)
        y = np.sqrt(2.0) * R2D * xp.sin(g)
        return x, y
    if code in ("SFL", "GLS"):
        return phi * xp.cos(theta * D2R), theta
    if code == "AIT":
        p, t = phi * D2R / 2.0, theta * D2R
        gamma = xp.sqrt(2.0 / (1.0 + xp.cos(t) * xp.cos(p)))
        x = 2.0 * gamma * xp.cos(t) * xp.sin(p) * R2D
        y = gamma * xp.sin(t) * R2D
        return x, y
    if code == "CYP":
        mu = _pv(pv, 1, 1.0)
        lam = _pv(pv, 2, 1.0)
        t = theta * D2R
        return lam * phi, R2D * (mu + lam) * xp.sin(t) / (mu + xp.cos(t))
    if code == "PAR":
        t = theta * D2R
        return phi * (2.0 * xp.cos(2.0 * t / 3.0) - 1.0), \
            180.0 * xp.sin(t / 3.0)
    if code == "BON":
        t1 = _pv(pv, 1, 0.0)
        if t1 == 0.0:
            return phi * xp.cos(theta * D2R), theta  # degenerates to SFL
        t1r = t1 * D2R
        c = 1.0 / np.tan(t1r) + t1r
        t = theta * D2R
        rho = c - t
        E = phi * D2R * xp.cos(t) / rho
        return R2D * rho * xp.sin(E), R2D * (c - rho * xp.cos(E))
    if code == "PCO":
        t = theta * D2R
        tc = _theta_cot_theta(t, xp)
        small = xp.abs(t) < 1e-7
        safe = xp.where(small, 1.0, t)
        cot = tc / safe
        E = phi * D2R * xp.sin(safe)
        x = xp.where(small, phi, R2D * cot * xp.sin(E))
        sh = xp.sin(E / 2.0)
        y = xp.where(small, 0.0 * t,
                     R2D * (safe + cot * 2.0 * sh * sh))
        return x, y
    raise ValueError(f"unsupported projection {code!r}")


def celestial_pole(code: str, crval1: float, crval2: float,
                   lonpole: float | None, latpole: float | None, pv=()):
    """Compute celestial coordinates of the native pole (alpha_p, delta_p)
    and the native longitude of the celestial pole phi_p.

    Implements eq. 8-10 of Calabretta & Greisen (2002)."""
    phi0, theta0 = fiducial_native(code, pv)
    a0, d0 = crval1 * D2R, crval2 * D2R

    if lonpole is None:
        lonpole = 0.0 if crval2 >= theta0 else 180.0
    phip = lonpole * D2R
    if latpole is None:
        latpole = 90.0

    if theta0 == 90.0:
        # zenithal: pole at the reference point
        return crval1, crval2, lonpole

    t0 = theta0 * D2R
    dphi = phip - phi0 * D2R
    A = np.sin(t0)
    B = np.cos(t0) * np.cos(dphi)
    hyp = np.hypot(A, B)
    if hyp < 1e-12:
        # degenerate: delta_p unconstrained; use latpole
        dp = latpole * D2R
    else:
        gamma = np.arctan2(B, A)
        sarg = np.clip(np.sin(d0) / hyp, -1.0, 1.0)
        dp1 = np.arcsin(sarg) - gamma
        dp2 = np.pi - np.arcsin(sarg) - gamma
        # wrap into [-pi/2, pi/2+] range and pick solution nearest latpole
        cands = []
        for dpc in (dp1, dp2):
            if dpc > np.pi / 2 + 1e-12:
                dpc -= 2 * np.pi
            if dpc < -np.pi - 1e-12:
                dpc += 2 * np.pi
            if -np.pi / 2 - 1e-9 <= dpc <= np.pi / 2 + 1e-9:
                cands.append(dpc)
        if not cands:
            raise ValueError("no valid native pole solution")
        dp = min(cands, key=lambda v: abs(v - latpole * D2R))

    # alpha_p (eq. 9-10)
    if abs(np.cos(dp)) < 1e-12:
        ap = a0
    elif abs(d0 - np.pi / 2) < 1e-12:
        ap = a0
    else:
        sin_dphi = np.sin(dphi) * np.cos(t0) / np.cos(d0)
        cos_dphi = (np.sin(t0) - np.sin(dp) * np.sin(d0)) / (np.cos(dp) *
                                                             np.cos(d0))
        ap = a0 - np.arctan2(sin_dphi, cos_dphi)

    return ap * R2D, dp * R2D, lonpole


# The native<->celestial rotation is an involutive orthogonal map
#   x' = -sin(dp) x + cos(dp) z ;  y' = -y ;  z' = cos(dp) x + sin(dp) z
# applied between longitude-relative frames.  Using atan2(z, hypot(x, y))
# for the latitude keeps the transform well-conditioned near the poles
# (a naive arcsin(sin_lat) formulation loses half the float64 digits there).
def _rotate_pole(lon_rel, lat, delta_p, xp):
    dp = delta_p * D2R
    sdp, cdp = np.sin(dp), np.cos(dp)
    cl = xp.cos(lat * D2R)
    x = cl * xp.cos(lon_rel * D2R)
    y = cl * xp.sin(lon_rel * D2R)
    z = xp.sin(lat * D2R)
    xo = -sdp * x + cdp * z
    yo = -y
    zo = cdp * x + sdp * z
    lon_out = xp.arctan2(yo, xo) * R2D
    lat_out = xp.arctan2(zo, xp.sqrt(xo * xo + yo * yo)) * R2D
    return lon_out, lat_out


def native_to_celestial(phi, theta, alpha_p, delta_p, phi_p, xp=np):
    """Rotate native (phi, theta) to celestial (alpha, delta), all degrees."""
    da, delta = _rotate_pole(phi - phi_p, theta, delta_p, xp)
    return (alpha_p + da) % 360.0, delta


def celestial_to_native(alpha, delta, alpha_p, delta_p, phi_p, xp=np):
    """Rotate celestial (alpha, delta) to native (phi, theta), all degrees."""
    dphi, theta = _rotate_pole(alpha - alpha_p, delta, delta_p, xp)
    phi = (dphi + phi_p + 180.0) % 360.0 - 180.0
    return phi, theta
