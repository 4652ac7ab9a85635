"""CDC event decoding (reference F11/F12).

The reference worker receives Postgres NOTIFY events: channel
``"<tabla>_sync"`` and payload ``"<operation>:<record_id>"``, decoded with
``split(':', 1)`` / ``replace('_sync','')`` / int() with fallback (ref
``worker_sync.py:88-102``).  The Spark expression equivalent decodes a
whole DataFrame of events at once.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def decode_cdc_event(df: DataFrame, channel: str = "channel", payload: str = "payload") -> DataFrame:
    """Decode ``(channel, payload)`` → ``(table, op, record_id)``.

    * table: channel minus the ``_sync`` suffix, lowercased (ref
      worker_sync.py:88, sync_oltp_to_olap.py:369)
    * op: payload text before the first ``:`` (ref :89-93); payloads with
      no ``:`` yield the whole payload as op and NULL record_id, matching
      the reference's tolerant parse.
    * record_id: digits after the first ``:`` cast to long; non-numeric →
      NULL (reference falls back to full-sync on bad ids, ref :99-102).
    """
    ch = F.col(channel)
    pl = F.col(payload)
    table = F.lower(F.regexp_replace(ch, "_sync$", ""))
    op = F.lower(F.split(pl, ":", 2).getItem(0))
    rid_str = F.when(pl.contains(":"), F.split(pl, ":", 2).getItem(1))
    record_id = rid_str.cast("long")
    return df.withColumns({"table": table, "op": op, "record_id": record_id})


def json_prop(props: Column | str, key: str) -> Column:
    """Extract a JSON property from a JSON-text column (fixture
    ``events.props`` like ``{"k": 87}``) — built-in ``get_json_object``."""
    c = F.col(props) if isinstance(props, str) else props
    return F.get_json_object(c, f"$.{key}")
