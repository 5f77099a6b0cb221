"""Operator modules. Importing this package registers every query.

Import order is thematic (the LLM-data-pipeline set — the north-star
operators — first, then the relational surface); the driver-facing
ordering guarantee (oracled queries inside the 50-slot correctness
window) is enforced structurally by ``registry.ordered_queries``, not by
this import order.
"""

from simplex_mapreduce_spark.operators import (  # noqa: F401
    mr_parity,
    text,
    packing,
    sampling,
    dedup,
    clusters,
    entity,
    graph_rank,
    similarity,
    multimodal,
    custom,
    relational,
    relational_ext,
    joins,
    scd,
    windows,
    events,
    versioning,
)

# sketch utilities live under functions/ but register a query too
from simplex_mapreduce_spark.functions import sketches  # noqa: E402,F401
