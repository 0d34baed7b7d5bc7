"""Convert an OSM PBF extract to GeoParquet — the reference's flagship flow.

Usage: python examples/convert_monaco.py [pbf_path] [out_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from quackosm_spark.session import get_spark
from quackosm_spark.functions import convert_pbf_to_parquet


def main() -> None:
    pbf = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/tests/test_files/monaco.osm.pbf"
    workdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/quackosm_spark_example"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    out = convert_pbf_to_parquet(
        spark,
        pbf,
        working_directory=workdir,
        tags_filter={"building": True, "amenity": True, "highway": True},
        sort_result=True,
    )
    df = spark.read.parquet(str(out))
    print(f"wrote {out}: {df.count()} features")
    df.select("feature_id", "geometry").show(5, truncate=60)


if __name__ == "__main__":
    main()
