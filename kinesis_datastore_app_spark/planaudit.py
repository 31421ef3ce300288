"""Broadcast-hint plan audit: the no-forced-broadcast-of-growing-sides
rule as a mechanical gate (round-9; the round-8 review rule).

``audit_plan(df)`` walks a DataFrame's ANALYZED logical plan and
reports each ``broadcast()`` hint whose subtree reads an SF-growing
fixture table with no bounding node between the hint and the scan. A
frame is accepted as bounded when the plan PROVES a constant row
count independent of data size:

* an ungrouped Aggregate (1 row) or a LIMIT;
* an Aggregate grouped only by constant-domain columns (BOUNDED_COLS);
* a Filter ``unique_key (< | <= | ==) literal`` / ``IN (literals)``
  — the fixed-query-set idiom (UNIQUE_KEY_COLS);
* driver-created literal frames (LocalRelation/Range/LogicalRDD) and
  the constant-cardinality tables region/nation.

Anything else under a hint is a violation: a forced broadcast of a
frame that grows with the data OOMs the 100 TB design point — AQE must
own that choice (it broadcasts at fixture scale and degrades to a
shuffle join at 100 TB).

CLI twin: ``python tools/broadcast_audit.py`` runs it over the whole
registry; tests/test_plan_audit.py is the enforcing gate (violations
must exactly equal the justified allowlist there).

Round-10 closes the two blind spots the round-9 gate documented:
* the walk now descends into SUBQUERY EXPRESSIONS
  (ScalarSubquery/ListQuery/Exists/LateralSubquery plan expressions),
  so a hint hidden inside an IN/EXISTS/scalar subquery plan is
  reached (seeded negative test in tests/test_plan_audit.py);
* STREAMING plans are audited at writeStream time by the gate test
  (it spies on DataFrame.writeStream, so every execution site —
  run_to_table, foreachBatch starts, parquet sinks — feeds its stream
  DataFrame's analyzed plan through audit_plan before it runs), and
  StreamingRelation leaves over the events replay dirs classify as
  the SF-growing ``events`` table. stream_static_join's broadcast
  customer dim is now an explicit allowlist entry rather than prose.

Round-10 also covers foreachBatch BODIES (the last documented hole):
plans built inside a foreachBatch function exist only per micro-batch
at runtime, invisible to any walk of the stream plan — so the gate
test wraps ``DataStreamWriter.foreachBatch`` and runs each body with a
thread-flagged spy on the actions a body executes plans through
(``.write`` access, ``collect``, ``count``), feeding every executed
plan through audit_plan (seeded negative:
tests/test_plan_audit.py::test_audit_sees_hint_inside_foreachbatch_body).

Round-11 closes the last documented hole MECHANICALLY: a body executing
via some other action (foreach/foreachPartition/toLocalIterator) is
invisible to the spy — so ``scan_unaudited_actions`` AST-walks the
package and the suite fails if any such call exists outside an
explicit allowlist (currently empty; seeded negative in
tests/test_plan_audit.py::test_unaudited_action_scan).
"""

from __future__ import annotations

import re

# Fixture tables whose row count grows with the scale factor. region and
# nation are constant-cardinality (5 / 25 rows at every SF) — the only
# fixture tables a forced broadcast may always assume small.
SF_GROWING = {
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
}

# Columns whose value domain is a small constant independent of SF —
# grouping by (a subset of) these bounds an aggregate's output rows by
# the domain product, so broadcasting the aggregate is scale-safe.
# Every entry is justified by the fixture generator (FIXTURES.md):
#   event_type        5 values          o_orderpriority  5 values
#   c_mktsegment      5 values          l_returnflag     3 values
#   l_linestatus      2 values          source (docs)    small const set
#   lang (docs)       small const set   tickerSymbol     25 tickers
#   tradeType         {BUY, SELL}       n_name/r_name    25 / 5
# plus derived bounded axes: hour-of-day, day-offset-in-window (bounded
# retention window), sketch grid coordinates (constant D*W / M*K), and
# boolean flags.
BOUNDED_COLS = {
    "event_type",
    "o_orderpriority",
    "c_mktsegment",
    "l_returnflag",
    "l_linestatus",
    "source",
    "lang",
    "tickerSymbol",
    "tradeType",
    "n_name",
    "r_name",
    "n_nationkey",
    "r_regionkey",
    # derived 1-1 from event_type via lag() (agg_markov_transitions):
    # same constant domain
    "prev_type",
}

# Unique-key fixture columns: a filter `key < literal` / `key <= lit` /
# `key == lit` / `key IN (lits)` bounds output rows by the literal — the
# "fixed query set" idiom (e.g. sim-search takes vec_id < N_QUERIES).
UNIQUE_KEY_COLS = {"vec_id", "doc_id", "event_id"}

_TABLES_ALT = (
    "region|nation|customer|supplier|part|orders|lineitem|events|"
    "documents|embeddings"
)
_FIXTURE_RE = re.compile(rf"/({_TABLES_ALT})\.parquet")
# catalog.table() serves big/fragmented tables from a scratch RELAYOUT
# copy ('{tag}/relayout_{name}') — same data, different path (round-9
# review: without this, any fixture table above the relayout threshold
# escaped the audit entirely at sf0.1).
_RELAYOUT_RE = re.compile(rf"/relayout_({_TABLES_ALT})(?:$|/)")
# Streaming replay dirs are derived copies of the events fixture
# (source_factory: events_stream_v*/nt*/flush_*) — same growth law.
_STREAM_REPLAY_RE = re.compile(r"/events_stream_")



def _seq(s):
    return [s.apply(i) for i in range(s.size())]


def _name(node) -> str:
    return node.getClass().getSimpleName()


def _is_broadcast_hint(node) -> bool:
    if _name(node) != "ResolvedHint":
        return False
    return "broadcast" in node.hints().toString().lower()


def _grouping_cols(node) -> set[str] | None:
    """Attribute names referenced by an Aggregate's grouping exprs, or
    None if any grouping expr has no resolvable references (be strict)."""
    cols: set[str] = set()
    for g in _seq(node.groupingExpressions().toSeq()
                  if hasattr(node.groupingExpressions(), "toSeq")
                  else node.groupingExpressions()):
        refs = g.references()
        it = refs.iterator()
        any_ref = False
        while it.hasNext():
            cols.add(it.next().name())
            any_ref = True
        if not any_ref and _name(g) not in ("Literal",):
            # non-literal grouping expr with no references — give up
            return None
    return cols


def _unwrap_cast(expr):
    while _name(expr) == "Cast":
        expr = expr.child()
    return expr


def _const_key_filter(cond) -> bool:
    """True for `unique_key (<|<=|==) literal` or `unique_key IN (lits)`
    — a constant row-count bound when the column is a unique key."""
    cls = _name(cond)
    if cls in ("LessThan", "LessThanOrEqual", "EqualTo"):
        left = _unwrap_cast(cond.left())
        right = _unwrap_cast(cond.right())
        return (
            _name(left) == "AttributeReference"
            and left.name() in UNIQUE_KEY_COLS
            and _name(right) == "Literal"
        )
    if cls == "In":
        v = _unwrap_cast(cond.value())
        if not (_name(v) == "AttributeReference" and v.name() in UNIQUE_KEY_COLS):
            return False
        return all(_name(_unwrap_cast(x)) == "Literal" for x in _seq(cond.list()))
    if cls == "And":
        return _const_key_filter(cond.left()) or _const_key_filter(cond.right())
    return False


def _bounding(node) -> bool:
    """True if this node caps its output rows at a constant independent
    of input size."""
    n = _name(node)
    if n in ("GlobalLimit", "LocalLimit"):
        return True
    if n == "Aggregate":
        cols = _grouping_cols(node)
        if cols is not None and cols <= BOUNDED_COLS:
            return True
    if n == "Filter" and _const_key_filter(node.condition()):
        return True
    # Deduplicate on bounded columns would also bound, but no hint uses it.
    return False


def _offending_leaves(node, out: list[str]) -> None:
    """Collect SF-growing fixture leaves reachable from `node` without
    passing through a bounding node."""
    if _bounding(node):
        return
    n = _name(node)
    if n in ("LocalRelation", "OneRowRelation", "Range", "LogicalRDD"):
        return  # driver-created literal frames: bounded by construction
    if n in ("StreamingRelation", "StreamingRelationV2", "StreamingExecutionRelation"):
        # a stream source under a broadcast hint: name the fixture table
        # when the path identifies one (round-10 review: a blanket
        # "events" label sent authors chasing the wrong source), else
        # flag generically — an unbounded source is never a safe forced
        # broadcast regardless of its base table's cardinality
        desc = node.toString()
        m = _FIXTURE_RE.search(desc)
        if _STREAM_REPLAY_RE.search(desc):
            out.append("events")
        elif m:
            out.append(m.group(1))
        else:
            out.append("streaming-source")
        return
    if n == "LateralJoin":
        # the lateral subquery is a plan EXPRESSION whose rows multiply
        # into this node's output (unlike scalar/IN subqueries, whose
        # plans contribute a value or a filter, not rows) — its leaves
        # count toward the broadcast frame's size (round-10 review)
        for sq in _seq(node.subqueries()):
            _offending_leaves(sq, out)
    if n in ("LogicalRelation", "DataSourceV2Relation", "HiveTableRelation"):
        # LogicalRelation.toString() elides the path — read the file
        # index root paths; fall back to the node string for V2/others.
        try:
            desc = " ".join(
                p.toString() for p in _seq(node.relation().location().rootPaths())
            )
        except Exception:  # noqa: BLE001 — non-file relation
            desc = node.toString()
        m = _FIXTURE_RE.search(desc) or _RELAYOUT_RE.search(desc)
        if m and m.group(1) in SF_GROWING:
            out.append(m.group(1))
        # Other relations (published scratch artifacts — shingle/print
        # indexes, IVF/PQ codes) are NOT classified: most are
        # corpus-derived and growing, but none is broadcast-hinted
        # today (verified by reading every F.broadcast site, round 9).
        # This is a documented blind spot in the module docstring — an
        # artifact-read under a future hint needs a manual bound.
        return
    for c in _seq(node.children()):
        _offending_leaves(c, out)


# The actions a foreachBatch-body spy CANNOT see plans through: they
# execute per-row/per-partition driver-side iteration with no .write /
# collect / count interception point. The mechanical closure (round-10
# verdict item 7) is source-level: no code in the package may CALL
# these at all unless allowlisted with a manual audit note — the
# AST scan below enforces it in the suite, so the hole can never
# silently reopen when new code lands.
UNAUDITABLE_ACTIONS = frozenset({"foreach", "foreachPartition", "toLocalIterator"})


def scan_unaudited_actions(root: str, allowlist: frozenset = frozenset()) -> list[str]:
    """AST-walk every ``.py`` file under ``root`` for calls (or bare
    attribute references — ``df.toLocalIterator`` passed as a callback
    counts) to the UNAUDITABLE_ACTIONS; returns ``"relpath:line:name"``
    strings not covered by ``allowlist`` (exact ``relpath:name``
    entries). Comments and docstrings are invisible to the AST, so the
    module-docstring DISCUSSION of these APIs never trips the scan."""
    import ast
    import os

    hits: list[str] = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if d != "__pycache__"]
        for fn in filenames:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root)
            with open(path) as f:
                try:
                    tree = ast.parse(f.read(), filename=rel)
                except SyntaxError:
                    hits.append(f"{rel}:0:unparseable")
                    continue
            for node in ast.walk(tree):
                if (
                    isinstance(node, ast.Attribute)
                    and node.attr in UNAUDITABLE_ACTIONS
                    and f"{rel}:{node.attr}" not in allowlist
                ):
                    hits.append(f"{rel}:{node.lineno}:{node.attr}")
    return sorted(hits)


def static_shuffled_hash_joins(df) -> list[str]:
    """ShuffledHashJoin nodes in ``df``'s PRE-ADAPTIVE physical plan
    (queryExecution().sparkPlan() — the initial plan AQE starts from),
    one head-line string per hit.

    The scale rule this enforces (r14, optimization guide §3.1): a
    shuffled-hash join must only ever be taken through AQE's runtime
    SMJ→SHJ conversion (maxShuffledHashJoinLocalMapThreshold), which
    converts on MEASURED post-shuffle sizes — a statically-planned SHJ
    rests on Catalyst's size estimates, and a misestimated build side
    builds a non-spilling hash map that OOMs at 100 TB where sort-merge
    degrades gracefully. With spark.sql.join.preferSortMergeJoin at its
    default (true) and no SHUFFLE_HASH hints in the repo, no initial
    plan should contain one; the gate in tests/test_plan_audit.py keeps
    it that way mechanically.

    Streaming frames return [] — their micro-batch plans are planned at
    runtime (the foreachBatch spy audits the batch bodies' plans)."""
    if getattr(df, "isStreaming", False):
        return []
    plan = df._jdf.queryExecution().sparkPlan()
    out: list[str] = []

    def walk(node):
        if _name(node).startswith("ShuffledHashJoin"):
            out.append(node.toString().splitlines()[0][:160])
        for sq in _seq(node.subqueries()):
            walk(sq)
        for c in _seq(node.children()):
            walk(c)

    walk(plan)
    return out


def audit_plan(df) -> list[str]:
    """Return one violation string per broadcast hint in df's analyzed
    plan whose subtree reads an SF-growing fixture table unbounded.
    Works on batch AND streaming DataFrames (a streaming frame's
    analyzed plan has StreamingRelation leaves, classified above)."""
    plan = df._jdf.queryExecution().analyzed()
    violations: list[str] = []

    def walk(node):
        if _is_broadcast_hint(node):
            bad: list[str] = []
            for c in _seq(node.children()):
                _offending_leaves(c, bad)
            if bad:
                head = node.toString().splitlines()[0][:120]
                violations.append(f"broadcast of SF-growing {sorted(set(bad))} "
                                  f"at: {head}")
            # fall through: ALWAYS descend (round-9 review) — a hint
            # nested under a clean outer hint still executes its own
            # broadcast build below any bounding node (e.g.
            # broadcast(join(growing).groupBy(bounded).agg(...)): the
            # outer frame is 5 rows but the inner broadcast of the
            # growing dim materializes during the join and OOMs), so a
            # bounded/flagged outer subtree never exempts inner hints.
        # Descend into subquery-expression PLANS (round-10: closes the
        # round-9 gate's first blind spot — a broadcast hint inside an
        # IN/EXISTS/scalar/lateral subquery plan executes its own
        # broadcast build but is invisible to a children()-only walk).
        # QueryPlan.subqueries collects every PlanExpression's plan in
        # THIS node's expressions JVM-side — one py4j call per node,
        # never a Python walk of the (sometimes enormous) expression
        # trees themselves.
        for sq in _seq(node.subqueries()):
            walk(sq)
        for c in _seq(node.children()):
            walk(c)

    walk(plan)
    return violations
