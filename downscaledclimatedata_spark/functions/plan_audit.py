"""Structural plan lint: the anti-pattern classes rounds 7-9 fixed one
instance at a time, turned into a machine check over the PHYSICAL plan
of every registered spec so the classes are unshippable, not
re-findable.

Classes audited (tests/test_plan_audit.py parametrizes the registry
through :func:`audit_plan` and compares against explicit, reasoned
whitelists):

C1 ``cartesian``      — any ``CartesianProduct``: an unbroadcast cross
                        join is never acceptable at corpus scale.
C2 ``bnlj``           — ``BroadcastNestedLoopJoin``: acceptable ONLY
                        for a provably bounded broadcast side (the
                        single-row bounds/total crossJoins this engine
                        uses deliberately); each such spec is
                        whitelisted by name with the bounded side
                        documented.
C3 ``global_sort``    — a global ``Sort`` (the ``true`` flag in the
                        plan node): acceptable only on bounded report
                        relations (grouped histograms, top-k'd or
                        |groups|-bounded outputs), never on a
                        corpus-keyed (one-row-per-doc/order/event)
                        relation. ``TakeOrderedAndProject`` (top-k)
                        never triggers this.
C4 ``window``         — a window function whose partition spec has
                        neither a bin-convention column (the
                        two-phase-rank discipline, functions/ranks.py)
                        nor a high-cardinality key column, and whose
                        ordering is not bin-led (the bounded
                        histogram-offsets shape): partitioning a
                        corpus-sized relation on a low-cardinality
                        bare key funnels the corpus through |keys|
                        reducers.

The audit is a STRUCTURAL gate, not a cardinality prover — it cannot
see row counts, so bounded-relation exceptions are carried as explicit
per-spec whitelists in the test. The gate's value is forcing every new
spec that trips a class to either restructure or document why its
relation is bounded.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

# Bin-convention partition columns produced by functions/ranks.py and
# the per-plan binned disciplines (q46 _qbin, q65 _vbin/_abin, padding
# report _pbin, block-bucketed joins blk, ...): a window partitioned on
# one of these has parallelism ~ number of bins, never ~ |bare keys|.
BIN_COL_RE = re.compile(
    r"^(_?[a-z]{0,3}bin\w*|_[a-z]{1,3}b|blk|block|bucket|band|_gqb)\d*$")

# High-cardinality key columns of the test tables (one row per entity):
# a window partitioned on any of these shards by entity, which scales.
# `shard` is listed deliberately: the per-shard order windows
# (global_shuffle / epoch_expand / shard writes) partition on it BY
# DESIGN — shard count is the sizing knob chosen so one shard fits one
# task, the same contract as write_training_shards' one-task-per-shard
# repartition.
HIGH_CARD_RE = re.compile(
    r"^(.*(_id|key)|doc_id|vec_id|user_id|session_id|content_hash|"
    r"hash|h|ph|dhash|minhash|simhash|fp|sig|cid|qid|path|url|base_path|"
    r"key|word|term|token|gram|w1|w2|shingle|shard)$")


@dataclass
class PlanFindings:
    cartesian: int = 0
    bnlj: int = 0
    global_sorts: list[str] = field(default_factory=list)
    flagged_windows: list[str] = field(default_factory=list)


def _strip_ref(col: str) -> str:
    """``l_orderkey#123L`` -> ``l_orderkey``."""
    return col.split("#", 1)[0].strip()


def _split_window_spec(spec: str) -> tuple[list[str], list[str]]:
    """Partition cols and order cols of one ``windowspecdefinition``
    argument list (order entries carry ``ASC``/``DESC``)."""
    parts, orders = [], []
    depth = 0
    cur = ""
    args = []
    for ch in spec:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            args.append(cur.strip())
            cur = ""
        else:
            cur += ch
    if cur.strip():
        args.append(cur.strip())
    for a in args:
        if " ASC" in a or " DESC" in a:
            orders.append(a)
        elif a.startswith("specifiedwindowframe"):
            break
        else:
            parts.append(a)
    return parts, orders


def _window_ok(parts: list[str], orders: list[str]) -> bool:
    names = [_strip_ref(p) for p in parts]
    if any(BIN_COL_RE.match(n) or HIGH_CARD_RE.match(n) for n in names):
        return True
    # The histogram-offsets shape (functions/ranks.py phase 2): a
    # window over the bounded per-bin histogram, ordered by the bin.
    if orders:
        lead = _strip_ref(orders[0].split(" ", 1)[0])
        if BIN_COL_RE.match(lead):
            return True
    return False


def audit_plan(df: DataFrame) -> PlanFindings:
    """Lint the PHYSICAL plan of ``df`` for the four classes above.
    Plan-only: triggers analysis/optimization (and any driver-scalar
    jobs the spec builder itself runs), never executes ``df``."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    out = PlanFindings()
    out.cartesian = plan.count("CartesianProduct")
    out.bnlj = plan.count("BroadcastNestedLoopJoin")
    # physical global sort: `Sort [keys...], true, 0` (true = global)
    for m in re.finditer(r"Sort \[([^\]]*)\], true,", plan):
        out.global_sorts.append(m.group(1))
    for prefix, spec in _window_specs(plan):
        parts, orders = _split_window_spec(spec)
        if _window_ok(parts, orders):
            continue
        # The ranks-machinery histogram windows (functions/ranks.py
        # phase 2) aggregate the per-bin count `_bn` — they run over
        # the bounded histogram relation by construction, whatever
        # they partition on.
        if "(_bn#" in prefix:
            continue
        out.flagged_windows.append(spec[:160])
    return out


def _window_specs(plan: str) -> list[tuple[str, str]]:
    """Every ``windowspecdefinition(...)`` in the plan as
    ``(prefix, args)`` — ``args`` extracted with balanced-paren
    scanning (they nest: ``specifiedwindowframe(...)``), ``prefix``
    the ~60 chars before the marker (the windowed expression, e.g.
    ``sum(_bn#123L)``)."""
    out = []
    marker = "windowspecdefinition("
    i = 0
    while True:
        j = plan.find(marker, i)
        if j < 0:
            return out
        k = j + len(marker)
        depth = 1
        while k < len(plan) and depth:
            if plan[k] == "(":
                depth += 1
            elif plan[k] == ")":
                depth -= 1
            k += 1
        out.append((plan[max(0, j - 60):j], plan[j + len(marker):k - 1]))
        i = k
