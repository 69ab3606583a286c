"""Astronomy scalar functions, Spark-native.

Reference: sphdist (simpletable.py:1338-1363), coneSearch/zoneSearch
(simpletable.py:3056-3137), hms2deg/dms2deg/deg2hms/deg2dms
(simpletable.py:1109-1214), euler (simpletable.py:1218-1335),
project_aitoff (astro/astro.py:215-261), gaia healpix expression
(astro/astro.py:53-79), add_column_healpix (astro/astro.py:178-211).

Everything here is a pure Column expression (JVM builtin trig inside
whole-stage codegen) except healpix ang2pix, which is a vectorized
numpy pandas_udf (healpy is not required: the NESTED ang2pix is
implemented directly from the HEALPix bit-interleaving construction).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def sphdist(ra1, dec1, ra2, dec2) -> Column:
    """Great-circle distance in degrees (haversine), matching
    simpletable.py:1338-1363 (which uses the sin/cos haversine form).

    Args are Columns or column names (degrees). Pure builtin trig —
    codegen'd, pushdown-friendly when used in a filter.
    """
    ra1, dec1, ra2, dec2 = [F.col(c) if isinstance(c, str) else c for c in (ra1, dec1, ra2, dec2)]
    dlat = F.radians(dec2 - dec1) / 2
    dlon = F.radians(ra2 - ra1) / 2
    a = F.sin(dlat) ** 2 + F.cos(F.radians(dec1)) * F.cos(F.radians(dec2)) * F.sin(dlon) ** 2
    return F.degrees(F.lit(2) * F.asin(F.sqrt(a)))


def cone_search(
    df: DataFrame, ra0: float, dec0: float, radius_deg: float, ra: str = "ra", dec: str = "dec"
) -> DataFrame:
    """AstroTable.coneSearch (simpletable.py:3056-3097): rows within
    ``radius_deg`` of (ra0, dec0), with a ``separation`` column added
    (the reference adds it in selectWhere at 3216).

    A cheap bounding-box pre-filter brackets the cone so the scan can
    prune on simple range predicates before evaluating the trig.
    """
    sep = sphdist(ra, dec, F.lit(float(ra0)), F.lit(float(dec0)))
    dec_lo, dec_hi = dec0 - radius_deg, dec0 + radius_deg
    box = (F.col(dec) >= F.lit(dec_lo)) & (F.col(dec) <= F.lit(dec_hi))
    return (
        df.filter(box)
        .withColumn("separation", sep)
        .filter(F.col("separation") <= F.lit(float(radius_deg)))
    )


def zone_search(
    df: DataFrame,
    ramin: float,
    ramax: float,
    decmin: float,
    decmax: float,
    ra: str = "ra",
    dec: str = "dec",
) -> DataFrame:
    """AstroTable.zoneSearch (simpletable.py:3099-3137): rectangular
    ra/dec predicate — partition/row-group prunable."""
    return df.filter(
        (F.col(ra) >= F.lit(ramin))
        & (F.col(ra) <= F.lit(ramax))
        & (F.col(dec) >= F.lit(decmin))
        & (F.col(dec) <= F.lit(decmax))
    )


# ---------------------------------------------------------------------------
# sexagesimal <-> degrees (simpletable.py:1109-1214)
# ---------------------------------------------------------------------------
def hms2deg(col) -> Column:
    """'HH:MM:SS.s' -> degrees (simpletable.py:1191-1214); 15 deg/hour.

    Sign applies to the whole magnitude ('-01:30:00' = -22.5 deg, not
    -1h + 30m), mirroring the reference's strip-sign-then-negate."""
    c = F.col(col) if isinstance(col, str) else col
    sign = F.when(c.startswith("-"), F.lit(-1.0)).otherwise(F.lit(1.0))
    stripped = F.regexp_replace(c, r"^[+-]", "")
    p = F.split(stripped, ":")
    mag = (
        p.getItem(0).cast("double")
        + p.getItem(1).cast("double") / 60.0
        + p.getItem(2).cast("double") / 3600.0
    )
    return sign * mag * 15.0


def dms2deg(col) -> Column:
    """'+DD:MM:SS.s' -> degrees with sign handling (simpletable.py:1109-1133)."""
    c = F.col(col) if isinstance(col, str) else col
    sign = F.when(c.startswith("-"), F.lit(-1.0)).otherwise(F.lit(1.0))
    stripped = F.regexp_replace(c, r"^[+-]", "")
    p = F.split(stripped, ":")
    mag = (
        p.getItem(0).cast("double")
        + p.getItem(1).cast("double") / 60.0
        + p.getItem(2).cast("double") / 3600.0
    )
    return sign * mag


def deg2hms(col) -> Column:
    """degrees -> 'HH:MM:SS.ss' (simpletable.py:1137-1161)."""
    c = (F.col(col) if isinstance(col, str) else col) / 15.0
    hh = F.floor(c)
    mf = (c - hh) * 60.0
    mm = F.floor(mf)
    ss = (mf - mm) * 60.0
    return F.format_string("%02d:%02d:%05.2f", hh.cast("int"), mm.cast("int"), ss)


def deg2dms(col) -> Column:
    """degrees -> '+DD:MM:SS.ss' (simpletable.py:1164-1187)."""
    c = F.col(col) if isinstance(col, str) else col
    sign = F.when(c < 0, F.lit("-")).otherwise(F.lit("+"))
    a = F.abs(c)
    dd = F.floor(a)
    mf = (a - dd) * 60.0
    mm = F.floor(mf)
    ss = (mf - mm) * 60.0
    return F.concat(sign, F.format_string("%02d:%02d:%05.2f", dd.cast("int"), mm.cast("int"), ss))


# ---------------------------------------------------------------------------
# Aitoff projection (astro/astro.py:215-261)
# ---------------------------------------------------------------------------
def project_aitoff(lon, lat) -> tuple[Column, Column]:
    """Aitoff x,y from lon/lat degrees; lon wrapped to [-180, 180).

    sinc is expanded with the guarded sin(x)/x form (alpha=0 -> 1).
    Returns (x, y) Columns in the reference's normalized convention
    (astro/astro.py:248-251: divide by pi — x in ~[-1, 1], y in
    ~[-0.5, 0.5]).
    """
    import math

    lon_c = F.col(lon) if isinstance(lon, str) else lon
    lat_c = F.col(lat) if isinstance(lat, str) else lat
    # wrap to [-pi, pi)
    l = F.radians(((lon_c + 180.0) % 360.0) - 180.0)
    b = F.radians(lat_c)
    alpha = F.acos(F.cos(b) * F.cos(l / 2))
    # normalized sinc(alpha/pi) = sin(alpha)/alpha guarded at 0
    sinc_a = F.when(alpha == 0, F.lit(1.0)).otherwise(F.sin(alpha) / alpha)
    x = F.lit(2.0) * F.cos(b) * F.sin(l / 2) / sinc_a / F.lit(math.pi)
    y = F.sin(b) / sinc_a / F.lit(math.pi)
    return x.alias("aitoff_x"), y.alias("aitoff_y")


# ---------------------------------------------------------------------------
# HEALPix (astro/astro.py:26-101, 178-211)
# ---------------------------------------------------------------------------
def gaia_healpix_expr(source_id, level: int = 5) -> Column:
    """Gaia DR2+ source_id encodes healpix level-12 in the high bits:
    healpix_<level> = source_id div (34359738368 * 4^(12-level))
    (astro/astro.py:53-79). Pure integer division — codegen'd."""
    c = F.col(source_id) if isinstance(source_id, str) else source_id
    # divisor = 2^35 * 4^(12-level): a power of two, so exact integer
    # shift — double division would lose precision above 2^53 (real Gaia
    # source_ids reach ~6e18)
    shift = 35 + 2 * (12 - level)
    return F.shiftright(c.cast("long"), shift)


def _ang2pix_nest_np(nside: int, theta: np.ndarray, phi: np.ndarray) -> np.ndarray:
    """NESTED ang2pix from the HEALPix construction (public algorithm;
    same scheme healpy implements in C). Vectorized numpy; exact for
    nside a power of 2. theta: colatitude [0, pi], phi: longitude."""
    z = np.cos(theta)
    za = np.abs(z)
    tt = np.mod(phi, 2 * np.pi) * (2 / np.pi)  # in [0,4)

    ix = np.empty(theta.shape, dtype=np.int64)
    iy = np.empty(theta.shape, dtype=np.int64)
    face = np.empty(theta.shape, dtype=np.int64)

    eq = za <= 2.0 / 3.0
    # equatorial region
    if np.any(eq):
        temp1 = nside * (0.5 + tt[eq])
        temp2 = nside * (z[eq] * 0.75)
        jp = np.floor(temp1 - temp2).astype(np.int64)  # ascending edge line
        jm = np.floor(temp1 + temp2).astype(np.int64)  # descending edge line
        ifp = jp >> int(np.log2(nside))
        ifm = jm >> int(np.log2(nside))
        f = np.where(ifp == ifm, (ifp & 3) + 4, np.where(ifp < ifm, ifp, ifm + 8))
        face[eq] = f
        ix[eq] = jm & (nside - 1)
        iy[eq] = nside - (jp & (nside - 1)) - 1
    # polar caps
    po = ~eq
    if np.any(po):
        ntt = np.minimum(np.floor(tt[po]).astype(np.int64), 3)
        tp = tt[po] - ntt
        tmp = nside * np.sqrt(3 * (1 - za[po]))
        jp = np.floor(tp * tmp).astype(np.int64)
        jm = np.floor((1.0 - tp) * tmp).astype(np.int64)
        jp = np.minimum(jp, nside - 1)
        jm = np.minimum(jm, nside - 1)
        north = z[po] >= 0
        face[po] = np.where(north, ntt, ntt + 8)
        ix[po] = np.where(north, nside - jm - 1, jp)
        iy[po] = np.where(north, nside - jp - 1, jm)

    # bit-interleave ix (even bits) and iy (odd bits)
    def _spread(v: np.ndarray) -> np.ndarray:
        v = v.astype(np.uint64)
        v = (v | (v << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
        v = (v | (v << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
        v = (v | (v << np.uint64(2))) & np.uint64(0x3333333333333333)
        v = (v | (v << np.uint64(1))) & np.uint64(0x5555555555555555)
        return v

    pix = _spread(ix) | (_spread(iy) << np.uint64(1))
    return (face * nside * nside + pix.astype(np.int64)).astype(np.int64)


def _ang2pix_ring_np(nside: int, theta: np.ndarray, phi: np.ndarray) -> np.ndarray:
    """RING ang2pix (public HEALPix construction, same scheme as the
    canonical C ang2pix_ring_z_phi). Ring ordering counts pixels along
    iso-latitude rings from the north pole: north cap rings hold 4*ir
    pixels, the 2*nside-1 equatorial rings 4*nside each, mirrored in the
    south. Vectorized numpy."""
    z = np.cos(theta)
    za = np.abs(z)
    tt = np.mod(phi, 2 * np.pi) * (2 / np.pi)  # in [0,4)
    pix = np.empty(theta.shape, dtype=np.int64)

    eq = za <= 2.0 / 3.0
    if np.any(eq):
        temp1 = nside * (0.5 + tt[eq])
        temp2 = nside * (z[eq] * 0.75)
        jp = np.floor(temp1 - temp2).astype(np.int64)  # ascending edge line
        jm = np.floor(temp1 + temp2).astype(np.int64)  # descending edge line
        ir = nside + 1 + jp - jm  # ring counter from z=2/3, in {1, 2n+1}
        kshift = 1 - (ir & 1)
        ip = np.mod((jp + jm - nside + kshift + 1) >> 1, 4 * nside)
        pix[eq] = 2 * nside * (nside - 1) + (ir - 1) * 4 * nside + ip
    po = ~eq
    if np.any(po):
        tp = tt[po] - np.floor(tt[po])
        tmp = nside * np.sqrt(3 * (1 - za[po]))
        jp = np.floor(tp * tmp).astype(np.int64)
        jm = np.floor((1.0 - tp) * tmp).astype(np.int64)
        ir = jp + jm + 1  # ring number counted from the closest pole
        ip = np.mod(np.floor(tt[po] * ir).astype(np.int64), 4 * ir)
        north = z[po] > 0
        pix[po] = np.where(
            north, 2 * ir * (ir - 1) + ip, 12 * nside * nside - 2 * ir * (ir + 1) + ip
        )
    return pix


def healpix_udf(order: int, nest: bool = True):
    """pandas_udf (ra_deg, dec_deg) -> healpix index at ``order``
    (add_column_healpix, astro/astro.py:178-211; the reference's
    ``nest`` parameter selects NESTED vs RING ordering). Arrow-batched
    numpy — no per-row Python."""
    nside = 2**order
    kernel = _ang2pix_nest_np if nest else _ang2pix_ring_np

    @pandas_udf("long")
    def _hpx(ra: pd.Series, dec: pd.Series) -> pd.Series:
        ra_v = ra.to_numpy(dtype="float64", na_value=np.nan)
        dec_v = dec.to_numpy(dtype="float64", na_value=np.nan)
        ok = np.isfinite(ra_v) & np.isfinite(dec_v)
        out = np.zeros(len(ra_v), dtype=np.int64)
        if ok.any():
            theta = np.radians(90.0 - dec_v[ok])
            phi = np.radians(ra_v[ok])
            out[ok] = kernel(nside, theta, phi)
        # null/NaN coordinates -> null index, never a garbage pixel
        res = pd.Series(out, dtype="Int64")
        res[~ok] = pd.NA
        return res

    return _hpx


def add_column_healpix(df: DataFrame, order: int = 10, ra: str = "ra", dec: str = "dec", name: str = "healpix", nest: bool = True) -> DataFrame:
    return df.withColumn(name, healpix_udf(order, nest=nest)(F.col(ra), F.col(dec)))


# ---------------------------------------------------------------------------
# healpix-bucketed cone cross-match (the scale extension; SURVEY.md §4.3)
# ---------------------------------------------------------------------------
def crossmatch_cone(
    left: DataFrame,
    right: DataFrame,
    radius_deg: float,
    ra_l: str = "ra",
    dec_l: str = "dec",
    ra_r: str = "ra",
    dec_r: str = "dec",
    order: int = 6,
) -> DataFrame:
    """Table x table cone match without the O(n*m) cross join.

    Strategy: bucket both sides on a dec-zone id sized >= radius (a 1-D
    analog of healpix bucketing that needs no neighbor lookup: each left
    row joins its own zone and the two adjacent zones via explode), then
    refine with the exact sphdist predicate. The equi-join on zone id
    shuffles both sides on a well-distributed key; the refine predicate
    runs post-join, codegen'd.
    """
    zone_h = max(radius_deg, 1e-6)
    nz = F.lit(zone_h)

    for reserved in ("__zone", "separation"):
        if reserved in left.columns or reserved in right.columns:
            raise ValueError(
                f"crossmatch_cone reserves the column name {reserved!r}; "
                "rename it on the input first"
            )
    # disambiguate colliding column names up front (both sides commonly
    # use ra/dec): collided right columns get an _r suffix in the output
    # (deepened until unique, so a pre-existing '<col>_r' cannot collide)
    rt = right
    renamed = {}
    taken = set(left.columns) | set(right.columns)
    for c in right.columns:
        if c in left.columns:
            new = c + "_r"
            while new in taken:
                new += "_r"
            taken.add(new)
            rt = rt.withColumnRenamed(c, new)
            renamed[c] = new
    ra_r_eff = renamed.get(ra_r, ra_r)
    dec_r_eff = renamed.get(dec_r, dec_r)

    zl = F.floor((F.col(dec_l) + 90.0) / nz).cast("long")
    zr = F.floor((F.col(dec_r_eff) + 90.0) / nz).cast("long")

    lt = left.withColumn("__zone", F.explode(F.array(zl - 1, zl, zl + 1)))
    rt = rt.withColumn("__zone", zr)

    sep = sphdist(F.col(ra_l), F.col(dec_l), F.col(ra_r_eff), F.col(dec_r_eff))
    out = (
        lt.join(rt, on="__zone", how="inner")
        .withColumn("separation", sep)
        .filter(F.col("separation") <= F.lit(float(radius_deg)))
        .drop("__zone")
    )
    return out


# ---------------------------------------------------------------------------
# Euler angle coordinate rotation (simpletable.py:1218-1335)
# ---------------------------------------------------------------------------
# (psi, stheta, ctheta, phi) per select mode, J2000 — the classic
# astrolib euler constants (public algorithm; same table the reference
# hardcodes at simpletable.py:1259-1284).
_EULER_J2000 = {
    1: (0.57477043300, 0.88998808748, 0.45598377618, 4.9368292465),    # RA/Dec -> Gal
    2: (4.9368292465, -0.88998808748, 0.45598377618, 0.57477043300),   # Gal -> RA/Dec
    3: (0.00000000000, 0.39777715593, 0.91748206207, 0.0000000000),    # RA/Dec -> Ecl
    4: (0.00000000000, -0.39777715593, 0.91748206207, 0.00000000000),  # Ecl -> RA/Dec
    5: (0.11142137093, 0.86766622025, 0.49714719172, 4.71279419371),   # Ecl -> Gal
    6: (4.71279419371, -0.86766622025, 0.49714719172, 0.11142137093),  # Gal -> Ecl
}

# FK4 / B1950 constant set (same public astrolib table the reference
# selects with b1950=True, simpletable.py:1259-1284)
_EULER_B1950 = {
    1: (0.57595865315, 0.88781538514, 0.46019978478, 4.9261918136),
    2: (4.9261918136, -0.88781538514, 0.46019978478, 0.57595865315),
    3: (0.00000000000, 0.39788119938, 0.91743694670, 0.0000000000),
    4: (0.00000000000, -0.39788119938, 0.91743694670, 0.00000000000),
    5: (0.11129056012, 0.86766174755, 0.49715499774, 4.7005372834),
    6: (4.7005372834, -0.86766174755, 0.49715499774, 0.11129056012),
}


def euler(lon, lat, select: int = 1, b1950: bool = False) -> tuple[Column, Column]:
    """Rotate (lon, lat) degrees between celestial/galactic/ecliptic
    frames (mode table above; simpletable.py:1218-1335, incl. the
    ``b1950`` FK4 constant set). Pure builtin trig — codegen'd, no UDF.

    Returns (out_lon_deg, out_lat_deg) Columns.
    """
    table = _EULER_B1950 if b1950 else _EULER_J2000
    if select not in table:
        raise ValueError(f"select must be 1..6, got {select}")
    psi, stheta, ctheta, phi = table[select]
    lon_c = F.col(lon) if isinstance(lon, str) else lon
    lat_c = F.col(lat) if isinstance(lat, str) else lat

    # astrolib euler formula (simpletable.py:1326-1334):
    #   b_out = -stheta*cbsa + ctheta*sb
    #   a_out = atan2(ctheta*cbsa + stheta*sb, cb*cos(a))
    a = F.radians(lon_c) - F.lit(phi)
    b = F.radians(lat_c)
    sb = F.sin(b)
    cb = F.cos(b)
    cbsa = cb * F.sin(a)
    b_out = F.lit(-stheta) * cbsa + F.lit(ctheta) * sb
    b_clamped = F.least(F.greatest(b_out, F.lit(-1.0)), F.lit(1.0))
    a_out = F.atan2(F.lit(ctheta) * cbsa + F.lit(stheta) * sb, cb * F.cos(a))
    lon_out = F.pmod(F.degrees(a_out + F.lit(psi)), F.lit(360.0))
    lat_out = F.degrees(F.asin(b_clamped))
    return lon_out.alias("lon_out"), lat_out.alias("lat_out")


def knn_cone(
    left: DataFrame,
    right: DataFrame,
    k: int,
    radius_deg: float,
    id_left: str,
    ra_l: str = "ra",
    dec_l: str = "dec",
    ra_r: str = "ra",
    dec_r: str = "dec",
    tiebreak: str | None = None,
    round_sep: int = 6,
    rank_name: str = "knn_rank",
) -> DataFrame:
    """k-nearest-neighbour spatial join within a fixed search cone:
    for every left row, the ``k`` closest right rows among matches
    inside ``radius_deg`` (the bounded-radius kNN every catalog
    cross-identification pipeline runs — a finite search radius is
    what keeps the candidate space an equi-join instead of all-pairs).

    Composition: the dec-zone bucketed ``crossmatch_cone`` generates
    candidates (no O(n*m) pair space), then one window per left id
    ranks by (rounded separation, tiebreak) and keeps rank <= k. The
    window partitions on the left id — millions of small partitions,
    no global sort. Rows with fewer than k matches keep what they
    have; rows with none drop (inner semantics).

    Determinism: ``row_number`` needs a TOTAL order — ranking on the
    rounded separation alone would make which neighbour fills rank k
    among equidistant ties depend on partitioning. With
    ``tiebreak=None`` every atomic (orderable) right-side column is
    appended to the sort key so the result is run-stable; pass an
    explicit right-side id column when you know the unique key."""
    from pyspark.sql import types as T
    from pyspark.sql.window import Window

    m = crossmatch_cone(
        left, right, radius_deg, ra_l=ra_l, dec_l=dec_l, ra_r=ra_r, dec_r=dec_r
    ).withColumn("separation", F.round("separation", round_sep))
    order = [F.col("separation")]
    if tiebreak:
        order.append(F.col(tiebreak))
    else:
        atomic = (
            T.NumericType, T.StringType, T.BooleanType,
            T.DateType, T.TimestampType, T.BinaryType,
        )
        ties = [
            f.name for f in right.schema.fields
            if isinstance(f.dataType, atomic) and f.name in m.columns
        ]
        if not ties:
            raise ValueError(
                "knn_cone: no orderable right-side column for a "
                "deterministic tiebreak — pass tiebreak= explicitly"
            )
        order.extend(F.col(c) for c in ties)
    w = Window.partitionBy(id_left).orderBy(*order)
    return m.withColumn(rank_name, F.row_number().over(w)).filter(
        F.col(rank_name) <= k
    )
