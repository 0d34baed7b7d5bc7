"""Driver-harness compatibility gates.

The correctness driver canonicalizes each query result with pandas
``sort_values`` over ALL columns before hashing; a non-atomic column
(array/map/struct) raises ``TypeError: unhashable type`` inside pandas'
factorize and the query goes red with err instead of a value compare —
exactly how q135_url_dedup failed in round 9 despite being value-correct
(CORRECTNESS_r09.json). The repo convention (q05) is to emit lists as CSV
strings. This gate makes the convention structural: analysis-only schema
check over every contract query, no execution.
"""

from __future__ import annotations

import __spark_entry__ as entry


def test_all_query_outputs_are_atomic(spark):
    offenders = {}
    for name, fn in entry.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        bad = [
            f"{f.name}:{f.dataType.simpleString()}"
            for f in df.schema.fields
            if f.dataType.simpleString().startswith(("array", "map", "struct"))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "driver's pandas canonicalizer cannot sort/hash non-atomic columns; "
        f"CSV-join them (q05 convention): {offenders}"
    )
