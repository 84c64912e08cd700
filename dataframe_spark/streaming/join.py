"""Stream enrichment joins.

The standard pipeline shape: a high-volume event stream joined to a
slowly-changing dimension (user/customer profile). Spark executes a
stream-static equi-join without any streaming state — each
micro-batch joins against the (broadcastable) static side, so this
scales exactly like a batch broadcast join per trigger. The static
frame is re-read per micro-batch when backed by a file source, which
is also how dimension refreshes propagate without restarting the
query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame as SparkDF
from pyspark.sql import functions as F


def enrich_stream(
    stream: SparkDF,
    dim: SparkDF,
    on: list[str],
    how: str = "left",
    broadcast_dim: bool = True,
) -> SparkDF:
    """Join a stream to a static dimension on equality keys.

    ``left`` keeps every event (missing dimension rows surface as
    nulls — the useful default for enrichment); ``inner`` filters to
    matched events. The dim side broadcasts by default: stream-static
    joins are stateless, and a shuffled dim join would re-shuffle
    EVERY micro-batch."""
    if how not in ("left", "inner"):
        raise ValueError("stream-static enrichment supports left/inner")
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on=on, how=how)
