"""Z-order (Morton) data layout for multi-dimensional data skipping.

At 100 TB a columnar scan is pruned by per-file min/max statistics,
but a layout sorted on ONE dimension keeps only that dimension's
ranges narrow — a predicate on any other column still reads every
file. Interleaving the bits of two bucketed dimensions into a single
Morton key and laying the data out in Morton order keeps BOTH
dimensions' min/max ranges narrow in every file, so either predicate
prunes (the idea behind Delta/Iceberg ``Z-ORDER BY``). The reference
has no layout concept at all (text files; SURVEY.md §2.7), so this is
pure engine surface.

The interleave is generated once, in Python, as BOTH a Spark Column
expression and the equivalent ANSI-SQL string — the two can never
drift apart, which is what makes the layout oracle-checkable
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Bits kept per dimension; 2*BITS bits of Morton key. 8 bits/dim (256
# buckets) is enough to demonstrate and test the layout; production
# would size buckets to target file counts.
BITS = 8
BUCKETS = 1 << BITS


def morton_col(a: Column, b: Column) -> Column:
    """16-bit Morton interleave of two 8-bit bucket columns.

    Pure bitwise column arithmetic — stays inside whole-stage codegen,
    no UDF, no shuffle. ``a``'s bits land in the odd positions, ``b``'s
    in the even ones.
    """
    z = F.lit(0)
    for i in range(BITS):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
        z = z.bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return z


def morton_sql(a: str, b: str) -> str:
    """The same interleave as :func:`morton_col`, as an ANSI-SQL
    expression over integer columns/expressions ``a`` and ``b``."""
    parts = []
    for i in range(BITS):
        parts.append(f"((({a} >> {i}) & 1) << {2 * i + 1})")
        parts.append(f"((({b} >> {i}) & 1) << {2 * i})")
    return "(" + " | ".join(parts) + ")"
