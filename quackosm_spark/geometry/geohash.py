"""Geohash encoding as pure Column bit arithmetic — the spatial bucketing
key (neighbor joins, cell aggregation, cheap proximity blocking) computed
JVM-side with no UDF and no external library.

Complements ``cli.decode_geohash_bbox`` (the reference accepts geohash
strings as geometry filters; here we also PRODUCE them). The encoding is
the standard one: lat/lon bisection = fixed-point quantization, bits
interleaved lon-first, 5-bit groups through the base32 alphabet.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def geohash_encode(lat: Column, lon: Column, precision: int = 7) -> Column:
    """Geohash of (lat, lon) at ``precision`` characters. Quantization,
    bit interleaving, and base32 lookup are all literal-shift Column
    expressions — whole-stage codegen, embarrassingly parallel."""
    total = 5 * precision
    lon_bits = (total + 1) // 2
    lat_bits = total // 2
    # clamp BOTH bounds: out-of-domain input (lat < -90 / lon < -180) would
    # otherwise quantize negative, and sign-extended shifts emit garbage
    lon_q = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit((1 << lon_bits) - 1),
            F.floor((lon + 180.0) / 360.0 * F.lit(float(1 << lon_bits))).cast("long"),
        ),
    )
    lat_q = F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit((1 << lat_bits) - 1),
            F.floor((lat + 90.0) / 180.0 * F.lit(float(1 << lat_bits))).cast("long"),
        ),
    )
    inter = F.lit(0).cast("long")
    for k in range(lon_bits):
        bit = F.shiftright(lon_q, lon_bits - 1 - k).bitwiseAND(F.lit(1))
        inter = inter + F.shiftleft(bit, total - 1 - 2 * k)
    for k in range(lat_bits):
        bit = F.shiftright(lat_q, lat_bits - 1 - k).bitwiseAND(F.lit(1))
        inter = inter + F.shiftleft(bit, total - 1 - (2 * k + 1))
    chars = [
        F.substring(
            F.lit(GEOHASH32),
            (F.shiftright(inter, 5 * (precision - 1 - j)).bitwiseAND(F.lit(31)) + 1).cast("int"),
            1,
        )
        for j in range(precision)
    ]
    return F.concat(*chars)
