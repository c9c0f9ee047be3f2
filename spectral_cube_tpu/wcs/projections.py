"""Celestial projection math (FITS WCS Paper II, Calabretta & Greisen 2002).

The reference library delegates all of this to astropy's wcslib C wrapper;
this framework implements the projections it needs natively, as vectorized
numpy on the host and as pure-jnp functions usable inside jit on device
(see :func:`make_pix2world_fn`).

Supported codes: TAN, SIN (orthographic, no obliquity params), ARC, STG,
ZEA, AZP (with PV2_1=mu), CAR, CEA (PV2_1=lambda), MER, MOL, SFL/GLS,
AIT.  All functions work on *intermediate world coordinates* (x, y) in
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
                         "CEA", "MER", "MOL", "SFL", "GLS", "AIT", "")

# Fiducial native coordinates (phi0, theta0) per projection family [deg].
_ZENITHAL = {"TAN", "SIN", "ARC", "STG", "ZEA", "AZP"}
_CYLINDRICAL = {"CAR", "CEA", "MER", "MOL", "SFL", "GLS", "AIT", ""}


def _pv(pv, m, default):
    try:
        v = pv[m - 1]
    except (IndexError, TypeError):
        return default
    return default if v is None else float(v)


def fiducial_native(code: str):
    if code in _ZENITHAL:
        return 0.0, 90.0
    return 0.0, 0.0


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
                   lonpole: float | None, latpole: float | None):
    """Compute celestial coordinates of the native pole (alpha_p, delta_p)
    and the native longitude of the celestial pole phi_p.

    Implements eq. 8-10 of Calabretta & Greisen (2002)."""
    phi0, theta0 = fiducial_native(code)
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
