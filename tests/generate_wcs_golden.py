"""Generate tests/data/wcs_golden.json — an independent high-precision
oracle for the celestial projection engine.

The production code (spectral_cube_tpu/wcs/projections.py) implements the
FITS Paper II spherical-trig formulas.  This generator re-derives every
projection from FIRST-PRINCIPLES VECTOR GEOMETRY in 40-digit mpmath:

- zenithal projections are literal perspective projections of the unit
  sphere onto the plane tangent at the native pole (projector at the
  sphere center for TAN, at infinity for SIN, at z=-mu for AZP, at the
  antipode for STG; chord/arc length for ZEA/ARC),
- cylindrical projections use atanh/sin/arcsin of the z component,
- the native<->celestial rotation is built as an orthonormal matrix from
  the two pole-correspondence constraints (native pole -> (alpha_p,
  delta_p); the point at native (phi_p, delta_p) -> celestial pole) and
  validated against both constraints before use.

A sign or offset error in the production formulas cannot reproduce here,
so agreement at 1e-10 is meaningful — unlike a self-roundtrip.

Run ``python tests/generate_wcs_golden.py`` to regenerate the table.
"""

import json
import os

import mpmath as mp

mp.mp.dps = 40

D2R = mp.pi / 180
R2D = 180 / mp.pi


def unit(phi_deg, theta_deg):
    """Unit vector of (longitude phi, latitude theta), degrees."""
    p, t = mp.mpf(phi_deg) * D2R, mp.mpf(theta_deg) * D2R
    return mp.matrix([mp.cos(t) * mp.cos(p), mp.cos(t) * mp.sin(p),
                      mp.sin(t)])


def lonlat(v):
    lon = mp.atan2(v[1], v[0]) * R2D
    lat = mp.atan2(v[2], mp.hypot(v[0], v[1])) * R2D
    return lon, lat


def native2xy(code, phi, theta, pv=()):
    """Native (phi, theta) [deg] -> intermediate (x, y) [deg], from
    perspective/cylinder geometry on the unit vector."""
    u = unit(phi, theta)
    xu, yu, zu = u[0], u[1], u[2]
    rho = mp.hypot(xu, yu)
    if code == "TAN":          # projector at sphere center, plane z=1
        f = 1 / zu
        return R2D * yu * f, -R2D * xu * f
    if code == "SIN":          # projector at infinity (orthographic)
        return R2D * yu, -R2D * xu
    if code == "STG":          # projector at the antipode (0,0,-1)
        f = 2 / (1 + zu)
        return R2D * yu * f, -R2D * xu * f
    if code == "AZP":          # projector at (0,0,-mu)
        mu = mp.mpf(pv[0]) if pv else mp.mpf(0)
        f = (1 + mu) / (zu + mu)
        return R2D * yu * f, -R2D * xu * f
    if code == "ARC":          # radial distance = arc length from pole
        dist = mp.acos(zu) * R2D
        if rho == 0:
            return mp.mpf(0), mp.mpf(0)
        return dist * yu / rho, -dist * xu / rho
    if code == "ZEA":          # radial distance = chord length * R2D
        chord = mp.sqrt(xu ** 2 + yu ** 2 + (zu - 1) ** 2)
        if rho == 0:
            return mp.mpf(0), mp.mpf(0)
        r = R2D * chord
        return r * yu / rho, -r * xu / rho
    phi_d = mp.atan2(yu, xu) * R2D
    theta_r = mp.atan2(zu, rho)
    if code == "CAR":
        return phi_d, theta_r * R2D
    if code == "CEA":
        lam = mp.mpf(pv[0]) if pv else mp.mpf(1)
        return phi_d, R2D * zu / lam
    if code == "MER":
        return phi_d, R2D * mp.atanh(zu)
    if code == "SFL":
        return phi_d * rho, theta_r * R2D
    if code == "MOL":
        # solve 2g + sin 2g = pi sin(theta) with mpmath's root finder
        target = mp.pi * zu
        g = mp.findroot(lambda gg: 2 * gg + mp.sin(2 * gg) - target,
                        theta_r)
        return (2 * mp.sqrt(2) / mp.pi) * phi_d * mp.cos(g), \
            mp.sqrt(2) * R2D * mp.sin(g)
    if code == "AIT":
        gam = mp.sqrt(2 / (1 + mp.cos(theta_r) * mp.cos(phi_d * D2R / 2)))
        return 2 * gam * mp.cos(theta_r) * mp.sin(phi_d * D2R / 2) * R2D, \
            gam * mp.sin(theta_r) * R2D
    raise ValueError(code)


def rotation_matrix(alpha_p, delta_p, phi_p):
    """Native->celestial rotation from the two pole correspondences,
    by orthonormal triad matching (no trig identities shared with the
    production code)."""
    # native-frame vectors
    a_nat = unit(phi_p, delta_p)           # -> celestial pole
    b_nat = mp.matrix([0, 0, 1])           # native pole
    # celestial-frame images
    a_cel = mp.matrix([0, 0, 1])
    b_cel = unit(alpha_p, delta_p)

    def triad(a, b):
        e1 = a / mp.norm(a)
        b_perp = b - (b.T * e1)[0] * e1
        e2 = b_perp / mp.norm(b_perp)
        e3 = mp.matrix([e1[1] * e2[2] - e1[2] * e2[1],
                        e1[2] * e2[0] - e1[0] * e2[2],
                        e1[0] * e2[1] - e1[1] * e2[0]])
        m = mp.matrix(3, 3)
        for i in range(3):
            m[i, 0], m[i, 1], m[i, 2] = e1[i], e2[i], e3[i]
        return m

    M = triad(a_cel, b_cel) * triad(a_nat, b_nat).T
    # validate the constraints the matrix was built from
    assert mp.norm(M * a_nat - a_cel) < mp.mpf("1e-30")
    assert mp.norm(M * b_nat - b_cel) < mp.mpf("1e-30")
    # orthogonality
    I = M * M.T
    for i in range(3):
        for j in range(3):
            assert abs(I[i, j] - (1 if i == j else 0)) < mp.mpf("1e-30")
    return M


ZENITHAL = ["TAN", "SIN", "STG", "ARC", "ZEA", "AZP"]
CYL = ["CAR", "CEA", "MER", "SFL", "MOL", "AIT"]

# native test points: generic, pole-adjacent, lon-wrap
ZEN_POINTS = [(0, 89.0), (30, 60), (-120, 45), (179.5, 75), (-179.5, 80),
              (90, 89.999), (10, 30.5), (-45, 52.3)]
CYL_POINTS = [(0, 0), (30, 45), (-120, -45), (179.5, 10), (-179.5, -10),
              (10, 89.5), (-10, -89.5), (45, 0.001)]

PV = {"AZP": [2.0], "CEA": [0.5]}

# rotation cases: (alpha_p, delta_p, phi_p) incl. pole-adjacent poles
ROT_CASES = [(260.1083, -0.975, 180.0), (23.18, 30.57, 180.0),
             (0.0, 89.9, 180.0), (359.5, -89.9, 180.0),
             (123.4, 45.6, 90.0), (10.0, 0.0, 0.0)]
ROT_POINTS = [(0, 89), (30, 60), (-120, 45), (179.5, 30), (-179.5, 30),
              (90, 5), (-90, -5)]


def main():
    out = {"projections": {}, "rotations": []}
    for code in ZENITHAL + CYL:
        pts = ZEN_POINTS if code in ZENITHAL else CYL_POINTS
        pv = PV.get(code, [])
        entries = []
        for phi, theta in pts:
            x, y = native2xy(code, phi, theta, pv)
            entries.append({"phi": phi, "theta": theta,
                            "x": mp.nstr(x, 25), "y": mp.nstr(y, 25)})
        out["projections"][code] = {"pv": pv, "points": entries}
    for ap, dp, pp in ROT_CASES:
        M = rotation_matrix(ap, dp, pp)
        pts = []
        for phi, theta in ROT_POINTS:
            v = M * unit(phi, theta)
            lon, lat = lonlat(v)
            pts.append({"phi": phi, "theta": theta,
                        "alpha": mp.nstr(lon % 360, 25),
                        "delta": mp.nstr(lat, 25)})
        out["rotations"].append({"alpha_p": ap, "delta_p": dp,
                                 "phi_p": pp, "points": pts})
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "data", "wcs_golden.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
