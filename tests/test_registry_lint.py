"""Registry-wide output-contract lint.

The driver canonicalizes every query result through a pandas
``sort_values`` over all columns before hashing; a raw ``array<>``,
``map<>`` or ``struct<>`` output column makes that factorization throw
``TypeError: unhashable type`` and the row goes red regardless of the
values (this killed ``hof_gauntlet`` in round 4). The rule since round 1
is: stringify complex outputs (``F.array_join`` / ``F.to_json``) in both
the Spark query and its oracle. This lint enforces it statically for the
whole registry so no future entry can re-introduce the failure mode —
the dynamic twin lives in ``conftest.assert_driver_hashable``, run on
every oracle-parity collect.
"""

from __future__ import annotations

import pytest

from pyspark.sql.types import ArrayType, MapType, StructType

from mapreducelearnings_spark.queries import REGISTRY

from .conftest import SF_SMOKE


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_output_schema_is_driver_hashable(name, spark):
    df = REGISTRY[name].spark(spark, SF_SMOKE)
    complex_cols = [
        (f.name, f.dataType.simpleString())
        for f in df.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType, StructType))
    ]
    assert complex_cols == [], (
        f"{name} returns complex-typed columns {complex_cols}; stringify "
        "them (array_join/to_json) so the driver canonicalizer can hash "
        "the result"
    )
