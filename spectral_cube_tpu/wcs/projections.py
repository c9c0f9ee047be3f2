"""Celestial projection math (FITS WCS Paper II, Calabretta & Greisen 2002).

The reference library delegates all of this to astropy's wcslib C wrapper;
this framework implements the projections it needs natively, as vectorized
numpy on the host and as pure-jnp functions usable inside jit on device
(see :func:`make_pix2world_fn`).

Supported codes: TAN, SIN (orthographic, no obliquity params), ARC, STG,
ZEA, AZP (with PV2_1=mu), CAR, CEA (PV2_1=lambda), MER, MOL, SFL/GLS,
AIT, and the conic family COP/COE/COD/COO (PV2_1=theta_a, PV2_2=eta).  All functions work on *intermediate world coordinates* (x, y) in
**degrees** and native spherical coordinates (phi, theta) in **degrees**,
matching wcslib conventions.  ``pv`` is the tuple of PVi_m values on the
latitude axis (m=1, 2, ...).
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

SUPPORTED_PROJECTIONS = ("TAN", "SIN", "ARC", "STG", "ZEA", "AZP", "CAR",
                         "CEA", "MER", "MOL", "SFL", "GLS", "AIT",
                         "COP", "COE", "COD", "COO", "")

# Fiducial native coordinates (phi0, theta0) per projection family [deg].
_ZENITHAL = {"TAN", "SIN", "ARC", "STG", "ZEA", "AZP"}
_CYLINDRICAL = {"CAR", "CEA", "MER", "MOL", "SFL", "GLS", "AIT", ""}
_CONIC = {"COP", "COE", "COD", "COO"}


def _pv(pv, m, default):
    try:
        v = pv[m - 1]
    except (IndexError, TypeError):
        return default
    return default if v is None else float(v)


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
    """R_theta [deg] -> theta [deg] for zenithal projections."""
    if code == "AZP":
        mu = _pv(pv, 1, 0.0)
        if _pv(pv, 2, 0.0) != 0.0:
            raise ValueError("AZP with nonzero gamma (PV2_2) is not "
                             "supported")
        if mu == 0.0:
            return xp.arctan2(R2D, r) * R2D
        # Calabretta & Greisen (2002) eq. 19-20
        rho = r * D2R / (mu + 1.0)
        psi = xp.arctan2(xp.ones_like(rho), rho)
        omega = xp.arcsin(xp.clip(rho * mu / xp.sqrt(rho * rho + 1.0),
                                  -1.0, 1.0))
        theta1 = psi - omega
        theta2 = psi + omega - np.pi
        # pick the solution in [-90, 90] closest to +90 (wcslib convention)
        ok1 = xp.abs(theta1) <= np.pi / 2 + 1e-12
        theta = xp.where(ok1, theta1, theta2)
        return theta * R2D
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
    if code == "AZP":
        mu = _pv(pv, 1, 0.0)
        if _pv(pv, 2, 0.0) != 0.0:
            raise ValueError("AZP with nonzero gamma (PV2_2) is not "
                             "supported")
        # eq. 18: R = R2D (mu+1) cos(theta) / (mu + sin(theta))
        return R2D * (mu + 1.0) * xp.cos(t) / (mu + xp.sin(t))
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
    raise ValueError(f"unsupported projection {code!r}")


def proj_native2xy(code: str, phi, theta, xp=np, pv=()):
    """native (phi, theta) [deg] -> (x, y) [deg]."""
    code = code.upper()
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
