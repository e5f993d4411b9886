"""Tag records / fragments with seg_id via the segment map.

Reference: GroupMsgsWithMap + TagMsgsWithSegId (pipeline.py:263-274,
transform/tag_with_seg_id.py:9-26) — a CoGroupByKey-based manual hash join,
with the map side fanned out over time bins to fight skew
(tag_with_fragid_and_timebin.py:10-22). In Spark both collapse to a LEFT
join on frag_id. The segmap has one row per fragment — typically orders of
magnitude smaller than records but NOT constant-size, so the broadcast
decision is left to AQE (autoBroadcastJoinThreshold): small daily maps
broadcast; backfill-scale maps shuffle — strictly better than the
reference's static fan-out trick either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def tag_records_with_seg_id(tagged_records: DataFrame, segmap: DataFrame) -> DataFrame:
    m = segmap.select("frag_id", "seg_id")
    return tagged_records.join(m, "frag_id", "left").select(
        *tagged_records.columns, "seg_id"
    )


def tag_fragments_with_seg_id(fragments: DataFrame, segmap: DataFrame) -> DataFrame:
    m = segmap.select("frag_id", "seg_id")
    return fragments.join(m, "frag_id", "left").select(*fragments.columns, "seg_id")
