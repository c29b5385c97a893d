"""Pedotransfer scalar formulas as Catalyst column expressions.

Semantics from the reference ``libraries/pedotransfer.py`` (file:line cited
per function). All are closed-form polynomials/exponentials over sand/clay/
porosity columns — pure JVM expressions, fully codegen'd, no UDFs. The
reference applies them to whole numpy grids; here they apply to any cell or
zone DataFrame column.

Inputs follow the reference's conventions: Maidment-92 takes percentages
(0-100) + porosity fraction ``phi``; Saxton-2006 takes FRACTIONS (0-1) for
sand ``S``/clay ``C`` and percent organic matter ``OM``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def lambda_maidment92(phi: Column, clay: Column, sand: Column) -> Column:
    """Pore-size-distribution index (``pedotransfer.py:3-8``)."""
    return F.exp(
        -0.7842831 + 0.0177544 * sand - 1.062498 * phi
        - 0.00005304 * sand * sand - 0.00273493 * clay * clay
        + 1.11134946 * phi * phi - 0.03088295 * sand * phi
        + 0.00026587 * sand * sand * phi * phi
        - 0.00610522 * clay * clay * phi * phi
        - 0.00000235 * sand * sand * clay
        + 0.00798746 * clay * clay * phi
        - 0.00674491 * phi * phi * clay
    )


def residual_water_content_maidment92(phi: Column, clay: Column, sand: Column) -> Column:
    """Residual soil moisture (``pedotransfer.py:10-14``)."""
    return (
        -0.0182482 + 0.00087269 * sand + 0.00513488 * clay
        + 0.02939286 * phi - 0.00015395 * clay * clay
        - 0.0010827 * sand * phi
        - 0.00018233 * clay * clay * phi * phi
        + 0.00030703 * clay * clay * phi
        - 0.0023584 * phi * phi * clay
    )


def bubbling_pressure_maidment92(phi: Column, clay: Column, sand: Column) -> Column:
    """Brooks-Corey bubbling pressure (``pedotransfer.py:16-24``)."""
    return F.exp(
        5.3396738 + 0.1845038 * clay - 2.48394546 * phi
        - 0.00213853 * clay * clay - 0.04356349 * sand * phi
        - 0.61745089 * clay * phi
        + 0.00143598 * sand * sand * phi * phi
        - 0.00855375 * clay * clay * phi * phi
        - 0.00001282 * sand * sand * clay
        + 0.00895359 * clay * clay * phi
        - 0.00072472 * sand * sand * phi
        + 0.0000054 * clay * clay * sand
        + 0.50028060 * phi * phi * clay
    )


def theta_1500t(S: Column, C: Column, OM) -> Column:
    """Saxton-2006 wilting point, first solution (``pedotransfer.py:26-28``)."""
    return -0.024 * S + 0.487 * C + 0.006 * OM + 0.005 * S * OM \
        - 0.013 * C * OM + 0.068 * S * C + 0.031


def theta_1500(S: Column, C: Column, OM) -> Column:
    """Saxton-2006 wilting point (``pedotransfer.py:30-34``)."""
    t = theta_1500t(S, C, OM)
    return t + (0.14 * t - 0.02)


def theta_33t(S: Column, C: Column, OM) -> Column:
    """Saxton-2006 field capacity, first solution (``pedotransfer.py:36-38``)."""
    return -0.251 * S + 0.195 * C + 0.011 * OM + 0.006 * S * OM \
        - 0.027 * C * OM + 0.452 * S * C + 0.299


def theta_33(S: Column, C: Column, OM) -> Column:
    """Saxton-2006 field capacity (``pedotransfer.py:40-44``)."""
    t = theta_33t(S, C, OM)
    return t + 1.283 * t * t - 0.374 * t - 0.015


def theta_s33t(S: Column, C: Column, OM) -> Column:
    """Saxton-2006 33kPa-to-sat moisture, first solution (``pedotransfer.py:46-48``)."""
    return 0.278 * S + 0.034 * C + 0.022 * OM - 0.018 * S * OM \
        - 0.027 * C * OM - 0.584 * S * C + 0.078


def theta_s33(S: Column, C: Column, OM) -> Column:
    """Saxton-2006 33kPa-to-sat moisture (``pedotransfer.py:50-54``)."""
    t = theta_s33t(S, C, OM)
    return t + 0.636 * t - 0.107


def theta_s(S: Column, C: Column, OM) -> Column:
    """Saxton-2006 saturated moisture (``pedotransfer.py:56-61``)."""
    return theta_33(S, C, OM) + theta_s33(S, C, OM) - 0.097 * S + 0.043


def lambda_saxton2006(S: Column, C: Column, OM) -> Column:
    """Saxton-2006 pore-size index (``pedotransfer.py:63-67``)."""
    return (F.log(theta_33(S, C, OM)) - F.log(theta_1500(S, C, OM))) / \
        (F.log(F.lit(1500.0)) - F.log(F.lit(33.0)))


def ksat_saxton2006(S: Column, C: Column, OM) -> Column:
    """Saxton-2006 saturated conductivity mm/h (``pedotransfer.py:69-74``)."""
    return 1930.0 * F.pow(theta_s(S, C, OM) - theta_33(S, C, OM),
                          3.0 - lambda_saxton2006(S, C, OM))


def psisat_saxton2006(S: Column, C: Column, OM) -> Column:
    """Saxton-2006 air-entry suction kPa (``pedotransfer.py:76-86``).

    vwcr=0, evaluated at vwc=theta_33, psi=33 as in the reference.
    """
    b = 1.0 / lambda_saxton2006(S, C, OM)
    return 33.0 * F.pow(theta_33(S, C, OM) / theta_s(S, C, OM), b)


# FAO nearest-centroid texture class (``pedotransfer.py:88-114``): 7 fixed
# centroids (sand, clay, silt); class = argmin euclidean distance, ids 1..7.
_FAO_CENTROIDS = [  # (id, sand, clay, silt)
    (1, 83.0, 9.0, 8.0), (2, 37.0, 30.0, 33.0), (3, 17.0, 67.0, 17.0),
    (4, 60.0, 20.0, 20.0), (5, 50.0, 38.0, 12.0), (6, 27.0, 48.0, 25.0),
    (7, 46.0, 35.0, 19.0),
]


def fao_soil_texture(sand: Column, clay: Column, silt: Column) -> Column:
    """Nearest-centroid class id 1..7; NULL inputs -> NULL (reference masks
    to -9999, ``pedotransfer.py:104-112``). Ties resolved to the lowest id
    (np.argmin first-match semantics)."""
    dists = [
        (cid, (sand - s) * (sand - s) + (silt - st) * (silt - st) + (clay - c) * (clay - c))
        for cid, s, c, st in _FAO_CENTROIDS
    ]
    best = F.least(*[d for _, d in dists])
    expr = F.lit(None).cast("int")
    # reversed so the FIRST (lowest id) centroid wins ties, like np.argmin
    for cid, d in reversed(dists):
        expr = F.when(d == best, F.lit(cid)).otherwise(expr)
    return F.when(sand.isNull() | clay.isNull() | silt.isNull(),
                  F.lit(None).cast("int")).otherwise(expr)
