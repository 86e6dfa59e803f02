"""Beacon analytics library: the reference's documented query surface.

Every query the reference ships in its docs/README
(``docs/CLICKHOUSE_GUIDE.md:275-375``, ``docs/PARQUET_GUIDE.md:180-199,
447-470``, ``README.md:125-139`` in /root/reference) re-expressed as
DataFrame functions over the structured lake. All take already-deduped
frames (callers use ``lake.read_latest``) so analytic results never
double-count re-transformed rows.

Scale notes: the blocks⋈rewards / blocks⋈withdrawals joins are equi-joins
on ``slot`` — co-partitioned at write time and eligible for broadcast when
one side is a short slot range; time-bucketed aggregations group on a
``date_trunc`` of the materialized ``slot_timestamp`` so partition pruning
(date=) applies before the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def recent_blocks(blocks: DataFrame, min_slot: int = 0, n: int = 10) -> DataFrame:
    """Recent blocks (CLICKHOUSE_GUIDE.md:275-280)."""
    return (
        blocks.filter(F.col("slot") > min_slot)
        .select("slot", "proposer_index", "version", "slot_timestamp")
        .orderBy(F.desc("slot"))
        .limit(n)
    )


def fork_distribution(blocks: DataFrame) -> DataFrame:
    """Blocks per fork (CLICKHOUSE_GUIDE.md:282-287)."""
    return (
        blocks.groupBy("version")
        .agg(F.count(F.lit(1)).alias("block_count"))
        .orderBy(F.desc("block_count"), "version")
    )


def top_proposers(blocks: DataFrame, n: int = 20,
                  since: Column | None = None) -> DataFrame:
    """Top proposers, optionally time-bounded (CLICKHOUSE_GUIDE.md:289-295)."""
    df = blocks if since is None else blocks.filter(F.col("slot_timestamp") >= since)
    return (
        df.groupBy("proposer_index")
        .agg(F.count(F.lit(1)).alias("blocks_proposed"))
        .orderBy(F.desc("blocks_proposed"), "proposer_index")
        .limit(n)
    )


def blob_commitment_check(blocks: DataFrame, blob_commitments: DataFrame,
                          n: int = 20) -> DataFrame:
    """Declared vs actual blob commitments per block
    (CLICKHOUSE_GUIDE.md:301-314): J5 join + group."""
    actual = blob_commitments.groupBy("slot").agg(
        F.count("commitment").alias("actual_commitments")
    )
    return (
        blocks.filter(F.col("blob_kzg_commitments_count") > 0)
        .join(actual, "slot", "left")
        .select(
            "slot", "proposer_index", "blob_kzg_commitments_count",
            F.coalesce("actual_commitments", F.lit(0)).alias("actual_commitments"),
        )
        .orderBy(F.desc("slot"))
        .limit(n)
    )


def withdrawals_daily(blocks: DataFrame, withdrawals: DataFrame,
                      n: int = 30) -> DataFrame:
    """Daily withdrawal totals (CLICKHOUSE_GUIDE.md:316-329)."""
    return (
        blocks.join(withdrawals.select("slot", "withdrawal_index", "amount"), "slot")
        .groupBy(F.to_date("slot_timestamp").alias("date"))
        .agg(
            F.count(F.lit(1)).alias("total_withdrawals"),
            F.sum("amount").alias("total_amount"),
            F.avg("amount").alias("avg_amount"),
        )
        .orderBy(F.desc("date"))
        .limit(n)
    )


def execution_daily(blocks: DataFrame, execution_payloads: DataFrame) -> DataFrame:
    """Daily execution-payload stats (CLICKHOUSE_GUIDE.md:331-344)."""
    # blocks also carries transactions_count — alias the payload's copy
    ep = execution_payloads.select(
        "slot", "gas_used", F.col("transactions_count").alias("ep_tx_count")
    )
    return (
        blocks.join(ep, "slot")
        .groupBy(F.to_date("slot_timestamp").alias("date"))
        .agg(
            F.count(F.lit(1)).alias("blocks_with_execution"),
            F.avg("gas_used").alias("avg_gas_used"),
            F.avg("ep_tx_count").alias("avg_tx_count"),
        )
        .orderBy(F.desc("date"))
    )


def proposer_rewards(blocks: DataFrame, rewards: DataFrame,
                     min_blocks: int = 10) -> DataFrame:
    """Validator performance across forks: blocks ⋈ rewards (J4) with a
    HAVING filter (CLICKHOUSE_GUIDE.md:348-361)."""
    return (
        blocks.join(rewards.select("slot", F.col("total").alias("reward_total")),
                    "slot", "left")
        .groupBy("proposer_index", "version")
        .agg(
            F.count(F.lit(1)).alias("blocks"),
            F.avg("reward_total").alias("avg_reward"),
        )
        .filter(F.col("blocks") >= min_blocks)
        .orderBy("proposer_index", "version")
    )


def network_health_hourly(blocks: DataFrame) -> DataFrame:
    """Blocks/hour, active proposers, graffiti rate
    (CLICKHOUSE_GUIDE.md:363-375): A8 time buckets."""
    return (
        blocks.groupBy(F.date_trunc("hour", "slot_timestamp").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("blocks_per_hour"),
            F.count_distinct("proposer_index").alias("active_validators"),
            F.avg(
                F.when(F.length("graffiti") > 2, 1).otherwise(0)
            ).alias("graffiti_rate"),
        )
        .orderBy("hour")
    )


def fork_transitions(blocks: DataFrame) -> DataFrame:
    """First/last slot + activation time per fork
    (CLICKHOUSE_GUIDE.md:377-388)."""
    return (
        blocks.groupBy("version")
        .agg(
            F.min("slot").alias("first_slot"),
            F.max("slot").alias("last_slot"),
            F.count(F.lit(1)).alias("total_blocks"),
            F.min("slot_timestamp").alias("activation_time"),
        )
        .orderBy("first_slot")
    )


def latest_validator_state(validators: DataFrame) -> DataFrame:
    """Latest snapshot row per validator (PARQUET_GUIDE.md:447-470 —
    pandas idxmax → A11 argMax-per-group as a window)."""
    w = Window.partitionBy("validator_index").orderBy(
        F.desc("slot"), F.desc("insert_version")
    )
    return (
        validators.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def sync_participation_daily(sync_aggregates: DataFrame) -> DataFrame:
    """Average sync-committee participation per day (README.md:125-139
    participation analytics)."""
    return (
        sync_aggregates.groupBy(F.to_date("slot_timestamp").alias("date"))
        .agg(
            F.avg("participation_count").alias("avg_participation"),
            F.min("participation_count").alias("min_participation"),
            F.max("participation_count").alias("max_participation"),
        )
        .orderBy("date")
    )


def attestation_inclusion_delay(attestations: DataFrame) -> DataFrame:
    """Average/max inclusion delay (slots between attestation slot and the
    including block) per day — standard validator-performance analytic over
    the attestations table (README.md's analytics direction)."""
    delay = F.col("slot") - F.col("attestation_slot")
    return (
        attestations.filter(F.col("attestation_slot") > 0)
        .groupBy(F.to_date("slot_timestamp").alias("date"))
        .agg(
            F.avg(delay).alias("avg_delay"),
            F.max(delay).alias("max_delay"),
            F.count(F.lit(1)).alias("n_attestations"),
        )
        .orderBy("date")
    )


def queue_snapshot_diff(queue: DataFrame, key: str,
                        prev_slot: int, cur_slot: int) -> DataFrame:
    """Entries present in the previous queue snapshot but absent from the
    current one = applied between snapshots (the analysis documented at
    ``migrations/012_pending_queues.sql:11-14``; SURVEY §2.6 extension) —
    an anti-join between two snapshot slots."""
    prev = queue.filter(F.col("slot") == prev_slot)
    cur = queue.filter(F.col("slot") == cur_slot).select(key)
    return prev.join(cur, key, "left_anti").withColumn(
        "applied_by_slot", F.lit(cur_slot)
    )
