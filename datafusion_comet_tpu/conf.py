"""Typed config registry (the CometConf analog, reference:
spark/src/main/scala/org/apache/comet/CometConf.scala — ~75 spark.comet.*
keys, typed builders, categories, env-var defaults, doc generation).

Keys use the ``comet.<category>.<name>`` convention; every entry carries its
type, default, category, and doc string so ``generate_docs()`` stays in sync
with the code (the GenerateDocs.scala pattern).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, List, Optional

__all__ = ["ConfigEntry", "Config", "CONF", "generate_docs", "register_entry"]


@dataclasses.dataclass(frozen=True)
class ConfigEntry:
    key: str
    default: Any
    type_: type
    category: str
    doc: str
    env_var: Optional[str] = None

    def resolve_default(self) -> Any:
        if self.env_var and self.env_var in os.environ:
            raw = os.environ[self.env_var]
            if self.type_ is bool:
                return raw.lower() in ("1", "true", "yes")
            return self.type_(raw)
        return self.default


_REGISTRY: Dict[str, ConfigEntry] = {}


def _entry(key, default, category, doc, env_var=None) -> ConfigEntry:
    e = ConfigEntry(key, default, type(default), category, doc, env_var)
    _REGISTRY[key] = e
    return e


def register_entry(key, default, category, doc, env_var=None) -> ConfigEntry:
    """Public registration for keys created outside this module (the
    per-operator / per-expression gates the exec registry generates, and
    any extension-defined keys). Idempotent: re-registering an existing
    key returns the existing entry."""
    if key in _REGISTRY:
        return _REGISTRY[key]
    return _entry(key, default, category, doc, env_var)


# ---- exec ---------------------------------------------------------------------------
BATCH_CAPACITY = _entry(
    "comet.exec.batch.capacity", 1 << 23, "exec",
    "Static row capacity of a device batch (power of two). The analog of "
    "spark.comet.batchSize (8192 rows) scaled for whole-table HBM residency.",
)
JOIN_FANOUT = _entry(
    "comet.exec.join.maxBuildMatches", 4, "exec",
    "Static per-probe-row match fan-out K for hash joins; the engine "
    "re-plans with 4x K on overflow.",
)
JOIN_CARRY_RANGE = _entry(
    "comet.exec.join.carryRange.enabled", True, "exec",
    "Use the gather-free carry-range probe for general (duplicate-key) hash "
    "joins: one concat sort by (key, side) carries each key group's build "
    "range to its probe rows via cumulative scans, replacing ~2*log2(build) "
    "sequential binary-search gathers (latency-bound on TPU). Off = the "
    "vectorized binary-search probe.",
)
JOIN_SEMI_MINMAX = _entry(
    "comet.exec.join.semiMinMax.enabled", True, "exec",
    "Rewrite semi/anti/existence joins whose extra condition is a single "
    "comparison against one build column (q21's `l2.suppkey <> l1.suppkey` "
    "shape) into a per-key-group min/max carry: EXISTS(b: b.c > e) == "
    "group_max(c) > e, so no matched-pair list is ever materialized — the "
    "probe side gets its answer from two sorts + one segmented scan at "
    "build+probe capacity. Off = the generic pair-materializing path.",
)
JOIN_MAX_RETRIES = _entry(
    "comet.exec.join.maxRetries", 4, "exec",
    "Max join fan-out re-planning attempts before failing.",
)
STAGE_MAX_JOINS = _entry(
    "comet.exec.stage.maxJoinsPerProgram", 2, "exec",
    "Plans with more joins than this split into separately compiled stages "
    "with device-resident intermediates (join inputs materialize as temp "
    "tables). Bounds XLA program size: join-heavy TPC-H programs (q5/q18) "
    "monolithically exceed the TPU compiler's practical limits, and "
    "per-stage compiles hit the persistent cache independently. 0 disables "
    "staging (always compile one program).", env_var="COMET_STAGE_MAX_JOINS",
)
STAGE_MAX_HEAVY_OPS = _entry(
    "comet.exec.stage.maxHeavyOpsPerProgram", 3, "exec",
    "Beyond the join budget, stages whose program would hold more than "
    "this many HEAVY operators (joins, windows, grouping aggregates, "
    "expands, sorts) split at Window/HashAggregate boundaries into "
    "separately compiled programs. Bounds the tunnel-TPU compile poles on "
    "rollup+window+sort tails (TPC-DS q18/q22/q67/q86 compiled 18-60 min "
    "as one program); with AQE shrink between stages the post-aggregate "
    "programs run at group capacity, so the split costs little runtime. "
    "0 disables.", env_var="COMET_STAGE_MAX_HEAVY",
)
SHRINK_MAX_COMPILE_CELLS = _entry(
    "comet.exec.aqe.shrink.maxCompileCells", 32 << 20, "exec",
    "AQE stage-boundary compaction compiles a program that argsorts the "
    "full input capacity and gathers every column; above this capacity x "
    "column-count product the shrink is skipped unless the reduction is "
    ">=64x (the tunnel TPU compiler takes tens of minutes on 8M-row "
    "many-column compaction programs).", env_var="COMET_SHRINK_MAX_COMPILE_CELLS",
)
BNLJ_MAX_PRODUCT = _entry(
    "comet.exec.bnlj.maxProductRows", 1 << 26, "exec",
    "Refuse a broadcast nested-loop join whose cap_left x cap_right cross "
    "product exceeds this many rows (O(N*M) HBM): add join keys or filter "
    "the broadcast side instead of letting the device OOM.",
)
APPROX_PCT_SKETCH = _entry(
    "comet.exec.agg.approxPercentile.sketchSize", 512, "exec",
    "Equi-rank samples per group in the approx_percentile combinable sketch "
    "state (rank error ~ n/(2K) per compression). Documented deviation: the "
    "Spark accuracy argument is validated but the sketch size is this "
    "config, not accuracy/2 — state is K*8 bytes per group.",
)
AGG_MAX_GROUPS = _entry(
    "comet.exec.agg.maxGroups", 1 << 16, "exec",
    "Default static group capacity for hash aggregates.",
)
# ---- shuffle ------------------------------------------------------------------------
SPILL_CODEC = _entry(
    "comet.shuffle.codec", "zstd", "shuffle",
    "Spill/shuffle block compression codec: zstd|lz4|snappy|zlib|none, "
    "framed with the reference's 4-byte magic tags (ipc.rs:24-46). zstd is "
    "the reference's benchmarked default; an unavailable codec falls back "
    "to zlib (toolchain-guaranteed).",
)
SHUFFLE_SLOT_SLACK = _entry(
    "comet.shuffle.slotSlack", 2.0, "shuffle",
    "Per-destination bucket headroom multiplier over perfectly-balanced "
    "rows/partition (skew headroom; analog of shuffle spill thresholds).",
)
SHUFFLE_MODE = _entry(
    "comet.shuffle.mode", "auto", "shuffle",
    "auto|hash|broadcast preference for join distribution "
    "(spark.comet.shuffle.mode analog).",
)
CAST_ALLOW_INCOMPATIBLE = _entry(
    "comet.expression.Cast.allowIncompatible", True, "expressions",
    "Allow cast pairs marked Incompatible in the cast support matrix "
    "(docs/cast_matrix.md; spark.comet.expression.Cast.allowIncompatible "
    "analog — the reference defaults this OFF; here it defaults ON because "
    "there is no second engine to fall back to and every deviation is "
    "documented). Off = plans using such casts become unsupported with a "
    "per-pair reason.",
)
DEBUG_VALIDATE_BATCHES = _entry(
    "comet.debug.validateBatches", False, "debug",
    "Validate every operator's output batch invariants during tracing "
    "(shape/dtype/structure; values too outside jit) — the "
    "DebugBatchStream / debug_native validate_full analog "
    "(debug_batch_stream.rs, jni_api.rs:697). Raises BatchInvariantError "
    "naming the operator.",
)
# ---- expressions --------------------------------------------------------------------
JSON_DEVICE = _entry(
    "comet.expr.json.deviceEnabled", True, "expr",
    "Lower simple get_json_object paths to the device JSON-path kernel "
    "(source-span semantics; see docs/compatibility.md). Off = host json "
    "bridge for every path.",
)
REGEXP_ALLOW_INCOMPATIBLE = _entry(
    "comet.regexp.allowIncompatible", True, "expressions",
    "Allow regexp functions whose dialect differs from Java regex in corner "
    "cases (spark.comet.regexp.allowIncompatible analog; RLIKE runs on a "
    "device DFA, extract/replace on the host bridge).",
)
CASE_SENSITIVE = _entry(
    "comet.expression.caseSensitive", True, "expressions",
    "Case-sensitive column resolution (spark.sql.caseSensitive analog).",
)
SESSION_TIMEZONE = _entry(
    "comet.session.timezone", "UTC", "expressions",
    "Session timezone applied by timezone-aware temporal functions "
    "(spark.sql.session.timeZone analog); resolved to TZif transition "
    "tables at plan time.", env_var="COMET_TZ",
)
# ---- shuffle (cont.) ----------------------------------------------------------------
RANGE_SAMPLE_PER_DEVICE = _entry(
    "comet.shuffle.range.samplesPerDevice", 64, "shuffle",
    "Systematic sample size per device for in-program range-partition "
    "boundary estimation (analog of Spark RangePartitioner sampleSizePerPartition).",
)
# ---- aggregates ---------------------------------------------------------------------
COLLECT_MAX_ELEMS = _entry(
    "comet.agg.collect.maxElems", 16, "exec",
    "Default static element capacity of collect_list/collect_set results.",
)
BLOOM_NUM_BITS = _entry(
    "comet.agg.bloomFilter.numBits", 4096, "exec",
    "Default bloom filter size in bits "
    "(spark.sql.optimizer.runtime.bloomFilter.numBits analog).",
)
# ---- udf ----------------------------------------------------------------------------
UDF_STAGE_ON_NO_CALLBACK = _entry(
    "comet.udf.stageWhenNoCallbacks", True, "exec",
    "On backends without in-graph host callbacks, split plans at PythonUdf "
    "nodes and evaluate the UDF between device stages (the C2R/R2C "
    "transition analog). When false, PythonUdf raises on such backends.",
)
# ---- memory -------------------------------------------------------------------------
MEMORY_POOL_TYPE = _entry(
    "comet.memory.pool.type", "greedy_task_shared", "memory",
    "Host-side buffering pool type: unbounded | greedy | fair_spill | "
    "greedy_global | fair_spill_global | greedy_task_shared | "
    "fair_spill_task_shared | greedy_unified | fair_unified "
    "(spark.comet.exec.memoryPool analog, create_memory_pool mod.rs:33).",
)
MEMORY_FRACTION = _entry(
    "comet.memory.fraction", 0.8, "memory",
    "Fraction of device HBM the engine may plan into "
    "(spark.comet.exec.memoryPool.fraction analog).",
)
# ---- tracing ------------------------------------------------------------------------
TRACING_ENABLED = _entry(
    "comet.tracing.enabled", False, "tracing",
    "Emit Chrome-trace spans to comet-event-trace.json "
    "(spark.comet.tracing.enabled analog).",
    env_var="COMET_TPU_TRACING",
)
EXPLAIN_NATIVE = _entry(
    "comet.explain.enabled", False, "tracing",
    "Print annotated plans with metrics after execution "
    "(spark.comet.explain.native.enabled analog).",
)
# ---- scan ---------------------------------------------------------------------------
OBJECT_STORE_CREDENTIAL_PROVIDER = _entry(
    "comet.scan.objectStore.credentialProvider", "", "scan",
    "``module:callable`` path of the object-store credential/filesystem "
    "provider SPI (the CometS3CredentialProvider analog, reference "
    "objectstore/s3.rs + cloud/s3/credential_bridge.rs): called with the "
    "scan URI, returns (pyarrow_filesystem, fs_local_path) built with "
    "session credentials, or None for ambient pyarrow.fs resolution. "
    "Empty = ambient credentials only.",
)
SCAN_PRUNING = _entry(
    "comet.scan.parquet.pruning.enabled", True, "scan",
    "Row-group min/max pruning on Parquet footers (page-index analog).",
)
DPP_ENABLED = _entry(
    "comet.scan.dynamicPartitionPruning.enabled", True, "scan",
    "For lazy hive-partitioned parquet registrations: prune partition "
    "directories at query time from joins against filtered dimensions (the "
    "dim side pre-executes as one distinct-aggregate). Static filter "
    "pruning on partition columns always applies. Analog of CometScanExec "
    "dynamicallySelectedPartitions.",
)
SCAN_DICT_MAX_SIZE = _entry(
    "comet.scan.dictionary.maxSize", 1 << 16, "scan",
    "String columns with at most this many distinct values are "
    "dictionary-encoded at staging (sorted dict + int32 codes; codes are "
    "order-isomorphic to string order). 0 disables. Analog of the "
    "reference's Arrow dictionary handling (scan.rs:100), kept end-to-end.",
)
AGG_DENSE_MAX_DOMAIN = _entry(
    "comet.exec.agg.denseMaxDomain", 64, "exec",
    "Group-by key domains at most this large (provable from dictionary / "
    "narrow-type packing) aggregate via dense masked reductions: no row "
    "sort, no group-capacity hint, no overflow re-planning.",
)


class Config:
    """A mutable view over the registry (session-scoped settings)."""

    def __init__(self, overrides: Optional[Dict[str, Any]] = None):
        self._values: Dict[str, Any] = {}
        for k, e in _REGISTRY.items():
            self._values[k] = e.resolve_default()
        if overrides:
            for k, v in overrides.items():
                self.set(k, v)

    def get(self, entry: ConfigEntry):
        if entry.key not in self._values:  # registered after this Config
            self._values[entry.key] = entry.resolve_default()
        return self._values[entry.key]

    def set(self, key, value) -> None:
        k = key.key if isinstance(key, ConfigEntry) else key
        if k not in _REGISTRY:
            raise KeyError(f"unknown config key {k!r}")
        e = _REGISTRY[k]
        if not isinstance(value, e.type_) and not (
            e.type_ is float and isinstance(value, int)
        ):
            raise TypeError(f"{k} expects {e.type_.__name__}, got {type(value).__name__}")
        self._values[k] = value

    def as_dict(self) -> Dict[str, Any]:
        return dict(self._values)


CONF = Config()


def generate_docs() -> str:
    """Markdown config reference (GenerateDocs.scala analog)."""
    lines = ["| key | default | category | doc |", "|---|---|---|---|"]
    for k in sorted(_REGISTRY):
        e = _REGISTRY[k]
        lines.append(f"| `{e.key}` | `{e.default}` | {e.category} | {e.doc} |")
    return "\n".join(lines)
