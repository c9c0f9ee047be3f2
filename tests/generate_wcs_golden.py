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
    if code == "SIN:slant":    # orthographic along the direction
        # D = (-eta, xi, 1): P + t D lands on the plane z = 1 at
        # t = 1 - zu; plane axes e_x = y-hat, e_y = -x-hat as for SIN
        xi, eta = mp.mpf(pv[0]), mp.mpf(pv[1])
        t = 1 - zu
        return R2D * (yu + xi * t), -R2D * (xu - eta * t)
    if code == "STG":          # projector at the antipode (0,0,-1)
        f = 2 / (1 + zu)
        return R2D * yu * f, -R2D * xu * f
    if code == "AZP":          # projector at (0,0,-mu)
        mu = mp.mpf(pv[0]) if pv else mp.mpf(0)
        f = (1 + mu) / (zu + mu)
        return R2D * yu * f, -R2D * xu * f
    if code == "AZP:tilt":     # projector at (0,0,-mu), plane through
        # (0,0,1) tilted by gamma about the native y axis: the ray
        # p0 + t (P - p0) is intersected with the plane of normal
        # n = (sin g, 0, cos g), then decomposed along the in-plane
        # axes e1 = (0,1,0), e2 = (cos g, 0, -sin g)
        mu, gam = mp.mpf(pv[0]), mp.mpf(pv[1]) * D2R
        p0 = mp.matrix([0, 0, -mu])
        d = u - p0
        n = mp.matrix([mp.sin(gam), 0, mp.cos(gam)])
        c0 = mp.matrix([0, 0, 1])
        t = (n.T * (c0 - p0))[0] / (n.T * d)[0]
        q = p0 + t * d - c0
        e1 = mp.matrix([0, 1, 0])
        e2 = mp.matrix([mp.cos(gam), 0, -mp.sin(gam)])
        return R2D * (q.T * e1)[0], -R2D * (q.T * e2)[0]
    if code == "ZPN":          # zenithal polynomial: the definition IS
        # the polynomial in the pole distance; evaluated in mpmath
        zeta = (90 - mp.mpf(theta)) * D2R
        r = mp.mpf(0)
        for k, c in enumerate(pv):
            r += mp.mpf(c) * zeta ** k
        r *= R2D
        if rho == 0:
            return r * mp.sin(mp.mpf(phi) * D2R), \
                -r * mp.cos(mp.mpf(phi) * D2R)
        return r * yu / rho, -r * xu / rho
    if code == "CYP":          # meridian-plane perspective: projector on
        # the axis opposite point (-mu, 0), image line at radius lambda
        mu, lam = mp.mpf(pv[0]), mp.mpf(pv[1])
        phi_d = mp.atan2(yu, xu) * R2D
        t = (lam + mu) / (rho + mu)
        return lam * phi_d, R2D * t * zu
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
    if code == "SZP":
        # literal ray-plane perspective: projector P diametrically
        # opposite (phi_c, theta_c) at distance mu, plane z = 1
        mu, pc, tc = (mp.mpf(v) for v in pv)
        P = -mu * unit(pc, tc)
        d = u - P
        t = (1 - P[2]) / d[2]
        q = P + t * d
        return R2D * q[1], -R2D * q[0]
    if code == "TSC":
        # gnomonic projection onto the circumscribed cube: find the face
        # whose outward normal has the largest dot product with u, then
        # intersect the ray from the center with that face's plane and
        # decompose along the face's in-plane axes.  Face layout and
        # orientations as documented in projections.py (continuity
        # across every shared edge is asserted in test_wcs_golden).
        faces = [
            # (normal, e_x axis, e_y axis, x0, y0); frame: unit() above
            (mp.matrix([0, 0, 1]), mp.matrix([0, 1, 0]),
             mp.matrix([-1, 0, 0]), 0, 90),                    # north
            (mp.matrix([1, 0, 0]), mp.matrix([0, 1, 0]),
             mp.matrix([0, 0, 1]), 0, 0),                      # phi=0
            (mp.matrix([0, 1, 0]), mp.matrix([-1, 0, 0]),
             mp.matrix([0, 0, 1]), 90, 0),                     # phi=90
            (mp.matrix([-1, 0, 0]), mp.matrix([0, -1, 0]),
             mp.matrix([0, 0, 1]), 180, 0),                    # phi=180
            (mp.matrix([0, -1, 0]), mp.matrix([1, 0, 0]),
             mp.matrix([0, 0, 1]), 270, 0),                    # phi=270
            (mp.matrix([0, 0, -1]), mp.matrix([0, 1, 0]),
             mp.matrix([1, 0, 0]), 0, -90),                    # south
        ]
        best = max(faces, key=lambda f: (f[0].T * u)[0])
        n_, ex, ey, x0, y0 = best
        q = u / (n_.T * u)[0]          # ray hits the face plane n.q = 1
        return x0 + 45 * (ex.T * q)[0], y0 + 45 * (ey.T * q)[0]
    raise ValueError(code)


def hpx_native2xy(phi, theta, pv):
    """HEALPix re-derived from its defining equal-area construction:
    the map-region area above any parallel equals J times the spherical
    cap area (J = pi K / 2H), computed here by mpmath quadrature — a
    different route than the production closed form."""
    H = mp.mpf(pv[0]) if pv else mp.mpf(4)
    K = mp.mpf(pv[1]) if len(pv) > 1 else mp.mpf(3)
    w = 180 / H
    J = mp.pi * K / (2 * H)            # total map area / sphere area
    t = mp.mpf(theta) * D2R
    lon = (mp.mpf(phi) + 180) % 360 - 180
    if abs(mp.sin(t)) <= (K - 1) / K:
        # equatorial belt: straight parallels, x = phi; y from the
        # equal-area condition 360 * y(theta) = J * band_area(0..theta)
        band = mp.quad(lambda tt: 2 * mp.pi * mp.cos(tt) * R2D ** 2,
                       [0, t])
        return lon, J * band / 360
    # polar zone: H 45-degree diamond facets; the region of the facets
    # above y has map area H * d^2 with d the distance below the tip, so
    # d = sqrt(J * cap_area / H)
    s = 1 if t > 0 else -1
    cap = mp.quad(lambda tt: 2 * mp.pi * mp.cos(tt) * R2D ** 2,
                  [abs(t), mp.pi / 2])
    d = mp.sqrt(J * cap / H)
    y = s * (w * (K + 1) / 2 - d)
    sigma = d * H / 180
    # facet centers: boundaries at multiples of 2w from -180 (K odd;
    # the even-K southern offset is asserted structurally in unit tests)
    i = mp.floor((lon + 180) / (2 * w))
    i = min(max(i, 0), H - 1)
    lon_c = -180 + (2 * i + 1) * w
    return lon_c + (lon - lon_c) * sigma, y


def air_native2xy(phi, theta, pv):
    """AIR: evaluate the Paper II closed form in mpmath, then CERTIFY it
    as the solution of Airy's least-squares problem: the first variation
    of E[R] = int_0^zeta_b [(R'-1)^2 + (R/sin z - 1)^2] sin z dz must
    vanish for perturbations v with v(0) = 0 (checked by quadrature for
    several v), and the natural boundary condition R'(zeta_b) = 1 must
    hold.  A wrong sign/factor in the closed form cannot pass this."""
    thb = mp.mpf(pv[0]) if pv else mp.mpf(90)
    xib = (90 - thb) * D2R / 2
    cb = mp.log(mp.cos(xib)) / mp.tan(xib) ** 2 if xib != 0 \
        else mp.mpf(-0.5)

    def R(z):                          # radians -> radians, z = 90-theta
        xi = z / 2
        if xi == 0:
            return mp.mpf(0)
        return -2 * (mp.log(mp.cos(xi)) / mp.tan(xi) + cb * mp.tan(xi))

    zb = 2 * xib
    if zb > 0:
        # natural boundary condition of the variational problem
        h = mp.mpf("1e-20")
        Rp = (R(zb + h) - R(zb - h)) / (2 * h)
        assert abs(Rp - 1) < mp.mpf("1e-15"), float(Rp)
        # first variation for a basis of perturbations v(0)=0
        for v, vp in [(lambda z: z, lambda z: 1),
                      (lambda z: z ** 2, lambda z: 2 * z),
                      (lambda z: mp.sin(3 * z), lambda z: 3 * mp.cos(3 * z))]:
            dE = mp.quad(
                lambda z: 2 * ((R(z) / mp.sin(z) - 1) * v(z) / mp.sin(z)
                               + ((R(z + mp.mpf("1e-20")) -
                                   R(z - mp.mpf("1e-20"))) /
                                  mp.mpf("2e-20") - 1) * vp(z)) * mp.sin(z),
                [mp.mpf("1e-12"), zb])
            assert abs(dE) < mp.mpf("1e-10"), (float(dE),)
    z = (90 - mp.mpf(theta)) * D2R
    r = R(z) * R2D
    p = mp.mpf(phi) * D2R
    return r * mp.sin(p), -r * mp.cos(p)


def qsc_native2xy(phi, theta):
    """QSC re-derived from its equal-area construction (O'Neill &
    Laubscher 1976): within a face sector, rays of constant slope
    omega = eta/xi map to straight planar rays whose slope s follows
    from the SECTOR-AREA equality

        45^2 s / 2 = J * Area{alpha in [0, atan omega]}   (by quadrature)

    with J = 3 pi / 8 the global map/sphere area ratio and the face-edge
    colatitude cos(chi_edge(alpha)) = cos a / sqrt(1 + cos^2 a) obtained
    from the cube geometry (|zeta| = |xi| plane section).  The radial
    family is the uniform (1 - zeta) interpolation anchored at the cube
    edge (u(edge) = 45 exactly); its equal-area correctness is certified
    separately by the constant-Jacobian test in test_wcs_golden.py.  The
    production closed form's atan/arcsin azimuthal function never
    appears here — agreement is meaningful."""
    u3 = unit(phi, theta)
    faces = [
        (mp.matrix([0, 0, 1]), mp.matrix([0, 1, 0]),
         mp.matrix([-1, 0, 0]), 0, 90),                    # north
        (mp.matrix([1, 0, 0]), mp.matrix([0, 1, 0]),
         mp.matrix([0, 0, 1]), 0, 0),                      # phi=0
        (mp.matrix([0, 1, 0]), mp.matrix([-1, 0, 0]),
         mp.matrix([0, 0, 1]), 90, 0),                     # phi=90
        (mp.matrix([-1, 0, 0]), mp.matrix([0, -1, 0]),
         mp.matrix([0, 0, 1]), 180, 0),                    # phi=180
        (mp.matrix([0, -1, 0]), mp.matrix([1, 0, 0]),
         mp.matrix([0, 0, 1]), 270, 0),                    # phi=270
        (mp.matrix([0, 0, -1]), mp.matrix([0, 1, 0]),
         mp.matrix([1, 0, 0]), 0, -90),                    # south
    ]
    best = max(faces, key=lambda f: (f[0].T * u3)[0])
    n_, ex, ey, x0, y0 = best
    zeta = (n_.T * u3)[0]
    xi = (ex.T * u3)[0]
    eta = (ey.T * u3)[0]
    ax, ae = abs(xi), abs(eta)
    amax, amin = max(ax, ae), min(ax, ae)
    if amax == 0:
        return mp.mpf(x0), mp.mpf(y0)
    om = amin / amax
    a1 = mp.atan(om)
    J = 3 * mp.pi / 8
    area = mp.quad(
        lambda a: 1 - mp.cos(a) / mp.sqrt(1 + mp.cos(a) ** 2), [0, a1])
    s = 2 * J * R2D ** 2 * area / mp.mpf(45) ** 2
    cos_edge = mp.cos(a1) / mp.sqrt(1 + mp.cos(a1) ** 2)
    core = 45 * mp.sqrt((1 - zeta) / (1 - cos_edge))
    minor = s * core
    if ax >= ae:
        uu, vv = mp.sign(xi) * core, mp.sign(eta) * minor
    else:
        uu, vv = mp.sign(xi) * minor, mp.sign(eta) * core
    return x0 + uu, y0 + vv


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


def conic_native2xy(code, phi, theta, pv):
    """Conics re-derived in mpmath from their DEFINING properties, each
    asserted numerically below (true scale on both standard parallels,
    plus the family property: perspective geometry / equal area /
    equidistance / conformality).  These properties uniquely determine
    the projection, so matching the production formulas certifies them."""
    ta = mp.mpf(pv[0]) * D2R
    eta = mp.mpf(pv[1]) * D2R
    t1, t2 = ta - eta, ta + eta

    if code == "COP":
        # explicit 3-D perspective construction: ray from the sphere
        # center to the cone tangent at theta_a, unrolled; secant cones
        # scale by cos(eta)
        C = mp.sin(ta)
        apex = mp.matrix([0, 1 / mp.sin(ta)])
        gdir = mp.matrix([mp.sin(ta), -mp.cos(ta)])  # unit generator

        def Rfn(t):
            p = mp.matrix([mp.cos(t), mp.sin(t)]) / mp.cos(t - ta)
            return R2D * mp.cos(eta) * ((p - apex).T * gdir)[0]
    elif code == "COE":
        # equal-area: C*R^2/2 = const - sin(theta); true scale at t1, t2
        s1, s2 = mp.sin(t1), mp.sin(t2)
        C = (s1 + s2) / 2
        const = (1 + s1 * s2) / (s1 + s2)

        def Rfn(t):
            return R2D * mp.sqrt(2 * (const - mp.sin(t)) / C)
    elif code == "COD":
        # equidistant: dR/dtheta = -1; true scale at t1, t2
        s1, s2 = mp.sin(t1), mp.sin(t2)
        if eta == 0:
            C = mp.sin(ta)
            R0 = mp.cos(ta) / mp.sin(ta)
        else:
            C = (mp.cos(t1) - mp.cos(t2)) / (2 * eta)
            R0 = (mp.cos(t1) + mp.cos(t2)) / (2 * C)

        def Rfn(t):
            return R2D * (R0 + (ta - t))
    elif code == "COO":
        # conformal: R = psi * tan((pi/2-t)/2)^C; true scale at t1, t2
        tn1 = mp.tan((mp.pi / 2 - t1) / 2)
        tn2 = mp.tan((mp.pi / 2 - t2) / 2)
        if eta == 0:
            C = mp.sin(ta)
        else:
            C = mp.log(mp.cos(t2) / mp.cos(t1)) / mp.log(tn2 / tn1)
        psi = mp.cos(t1) / (C * tn1 ** C)

        def Rfn(t):
            return R2D * psi * mp.tan((mp.pi / 2 - t) / 2) ** C
    else:
        raise ValueError(code)

    # property assertions (scales dimensionless: R converted deg->rad)
    h = mp.mpf("1e-12")

    def s_par(t):
        return C * Rfn(t) * D2R / mp.cos(t)

    def s_mer(t):
        return abs((Rfn(t + h) - Rfn(t - h)) / (2 * h)) * D2R

    for ti in (t1, t2):
        # true scale along both standard parallels
        assert abs(s_par(ti) - 1) < mp.mpf("1e-18"), (code, float(s_par(ti)))
    tprobe = ta + mp.mpf("0.2")
    if code == "COE":
        assert abs(s_par(tprobe) * s_mer(tprobe) - 1) < mp.mpf("1e-8")
    if code == "COD":
        assert abs(s_mer(tprobe) - 1) < mp.mpf("1e-8")
    if code == "COO":
        assert abs(s_par(tprobe) - s_mer(tprobe)) < mp.mpf("1e-8")

    Y0 = Rfn(ta)
    r = Rfn(mp.mpf(theta) * D2R)
    pc = C * mp.mpf(phi) * D2R
    return r * mp.sin(pc), -r * mp.cos(pc) + Y0


def pseudo_native2xy(code, phi, theta, pv):
    """PAR / BON / PCO re-derived from their DEFINING properties, each
    asserted numerically: PAR is the equal-area pseudocylindrical whose
    meridians are parabolas; BON is the pseudoconic with concentric
    circular parallels, true scale along every parallel and along the
    central meridian (equal-area follows and is asserted); PCO is the
    pseudoconic whose every parallel is an arc of its own tangent cone
    (radius cot(theta)) with true scale along every parallel and the
    central meridian."""
    p_r = mp.mpf(phi) * D2R
    t_r = mp.mpf(theta) * D2R
    h = mp.mpf("1e-12")
    if code == "PAR":
        def w(t):           # parallel half-width factor x = phi * w
            return 2 * mp.cos(2 * t / 3) - 1

        def yfn(t):
            return mp.pi * mp.sin(t / 3)

        # equal-area (up to the projection's constant global scale pi/3,
        # since FITS PAR is not unit-normalized): w(t) * dy/dt ∝ cos t
        for tp in (mp.mpf("0.3"), mp.mpf("-0.9"), mp.mpf("1.2")):
            dy = (yfn(tp + h) - yfn(tp - h)) / (2 * h)
            assert abs(w(tp) * dy / mp.cos(tp) - mp.pi / 3) < mp.mpf("1e-20")
        # parabolic meridians: x(y) quadratic => second difference exact
        ts = [mp.mpf("0.2"), mp.mpf("0.5"), mp.mpf("0.8"), mp.mpf("1.1")]
        ys = [yfn(t) for t in ts]
        xs = [w(t) for t in ts]  # phi = 1 meridian
        # fit quadratic through first three, predict the fourth
        import itertools
        A = mp.matrix([[y ** 2, y, 1] for y in ys[:3]])
        coef = mp.lu_solve(A, mp.matrix(xs[:3]))
        pred = coef[0] * ys[3] ** 2 + coef[1] * ys[3] + coef[2]
        assert abs(pred - xs[3]) < mp.mpf("1e-25")
        return phi * w(t_r), R2D * yfn(t_r)
    if code == "BON":
        t1 = mp.mpf(pv[0]) * D2R
        c = mp.cos(t1) / mp.sin(t1) + t1

        def rho(t):
            return c - t

        # true scale along the central meridian: |d rho / dt| = 1 (exact)
        # cone-tangency at the standard parallel: rho(t1) = cot(t1)
        assert abs(rho(t1) - mp.cos(t1) / mp.sin(t1)) < mp.mpf("1e-30")
        # equal-area: |J| / cos t == 1 with E = phi cos(t) / rho
        def fwd(p, t):
            E = p * mp.cos(t) / rho(t)
            return rho(t) * mp.sin(E), c - rho(t) * mp.cos(E)
        for (pp, tp) in ((mp.mpf("0.7"), mp.mpf("0.4")),
                         (mp.mpf("-1.1"), mp.mpf("-0.6"))):
            x0, y0 = fwd(pp, tp)
            xp_, yp_ = fwd(pp + h, tp)
            xt, yt = fwd(pp, tp + h)
            J = ((xp_ - x0) * (yt - y0) - (xt - x0) * (yp_ - y0)) / h ** 2
            assert abs(abs(J) / mp.cos(tp) - 1) < mp.mpf("1e-8")
        E = p_r * mp.cos(t_r) / rho(t_r)
        return R2D * rho(t_r) * mp.sin(E), R2D * (c - rho(t_r) * mp.cos(E))
    if code == "PCO":
        def cot(t):
            return mp.cos(t) / mp.sin(t)

        # each parallel: arc of radius cot(t) centered (0, t + cot(t));
        # true scale along the parallel fixes the arc angle E = phi sin(t)
        def fwd(p, t):
            E = p * mp.sin(t)
            return cot(t) * mp.sin(E), t + cot(t) * (1 - mp.cos(E))
        # true scale along every parallel: |d(x,y)/d phi| == cos t
        for (pp, tp) in ((mp.mpf("0.9"), mp.mpf("0.5")),
                         (mp.mpf("-2.0"), mp.mpf("-1.1"))):
            x0, y0 = fwd(pp, tp)
            x1, y1 = fwd(pp + h, tp)
            s = mp.hypot(x1 - x0, y1 - y0) / h
            assert abs(s - mp.cos(tp)) < mp.mpf("1e-8")
            # central meridian true scale: y(0, t) = t (exact)
            assert abs(fwd(0, tp)[1] - tp) < mp.mpf("1e-30")
        if t_r == 0:
            return mp.mpf(phi), mp.mpf(0)
        x, y = fwd(p_r, t_r)
        return R2D * x, R2D * y
    raise ValueError(code)


CONIC_CASES = {"COP": [45.0, 10.0], "COE": [45.0, 20.0],
               "COD": [-40.0, 15.0], "COO": [35.0, 12.0]}
CONIC_POINTS = [(0, 45), (30, 60), (-120, 20), (179, 70), (-179, 10),
                (15, -20), (0, 89.5)]

ZENITHAL = ["TAN", "SIN", "SIN:slant", "STG", "ARC", "ZEA", "AZP",
            "AZP:tilt", "ZPN", "SZP", "AIR", "AIR:whole"]
CYL = ["CAR", "CEA", "MER", "SFL", "MOL", "AIT", "CYP"]
PSEUDO = ["PAR", "BON", "BON:south", "PCO"]

# native test points: generic, pole-adjacent, lon-wrap
ZEN_POINTS = [(0, 89.0), (30, 60), (-120, 45), (179.5, 75), (-179.5, 80),
              (90, 89.999), (10, 30.5), (-45, 52.3)]
CYL_POINTS = [(0, 0), (30, 45), (-120, -45), (179.5, 10), (-179.5, -10),
              (10, 89.5), (-10, -89.5), (45, 0.001)]
# quad-cube / HEALPix points: cover every face / both zones and facet
# interiors (exact face edges are seams; continuity is tested separately)
QUAD_POINTS = [(0, 20), (100, 10), (185, -15), (265, 5), (-80, 3),
               (20, 70), (-140, -75), (44, 0.5), (0.5, 44.5), (12, -89.9)]
HPX_POINTS = [(10, 0), (30, 30), (-120, -35), (170.5, 10), (-179.5, -10),
              (10, 89.5), (-100, -80), (60, 42), (130, 60), (-20, -55)]

PV = {"AZP": [2.0], "CEA": [0.5],
      "SIN:slant": [0.3, -0.5],          # xi, eta (slant orthographic)
      "AZP:tilt": [2.0, 30.0],           # mu, gamma [deg]
      # ZPN coefficients are indexed from m = 0 (P0..P5)
      "ZPN": [0.0, 1.0, 0.0, 0.3, 0.0, 0.02],
      "CYP": [1.0, 0.7071],              # mu, lambda
      "BON": [45.0], "BON:south": [-35.0],
      "SZP": [2.0, 25.0, 60.0],          # mu, phi_c, theta_c [deg]
      "AIR": [45.0],                     # theta_b [deg]
      "AIR:whole": [],                   # default theta_b = 90
      "HPX:h6": [6.0, 3.0]}              # H, K

# codes whose pv list is indexed from m = 0 rather than m = 1
PV_FROM_M0 = {"ZPN"}

# rotation cases: (alpha_p, delta_p, phi_p) incl. pole-adjacent poles
ROT_CASES = [(260.1083, -0.975, 180.0), (23.18, 30.57, 180.0),
             (0.0, 89.9, 180.0), (359.5, -89.9, 180.0),
             (123.4, 45.6, 90.0), (10.0, 0.0, 0.0)]
ROT_POINTS = [(0, 89), (30, 60), (-120, 45), (179.5, 30), (-179.5, 30),
              (90, 5), (-90, -5)]


def main():
    out = {"projections": {}, "rotations": []}
    for code in ZENITHAL + CYL + PSEUDO + ["HPX", "HPX:h6", "TSC", "QSC"]:
        base = code.split(":")[0]
        if base in ("TSC", "QSC"):
            pts = QUAD_POINTS
        elif base == "HPX":
            pts = HPX_POINTS
        elif code in ZENITHAL:
            pts = ZEN_POINTS
        else:
            pts = CYL_POINTS
        pv = PV.get(code, [])
        entries = []
        for phi, theta in pts:
            if base in ("PAR", "BON", "PCO"):
                x, y = pseudo_native2xy(base, phi, theta, pv)
            elif base == "HPX":
                x, y = hpx_native2xy(phi, theta, pv)
            elif base == "AIR":
                x, y = air_native2xy(phi, theta, pv)
            elif base == "QSC":
                x, y = qsc_native2xy(phi, theta)
            else:
                x, y = native2xy(code, phi, theta, pv)
            entries.append({"phi": phi, "theta": theta,
                            "x": mp.nstr(x, 25), "y": mp.nstr(y, 25)})
        entry = {"pv": pv, "points": entries}
        if code in PV_FROM_M0:
            entry["pv_from_m0"] = True
        out["projections"][code] = entry
    for code, pv in CONIC_CASES.items():
        entries = []
        for phi, theta in CONIC_POINTS:
            x, y = conic_native2xy(code, phi, theta, pv)
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
