"""Expression-staging lint: flag loop-invariant expensive expressions
inside higher-order-function lambdas (VERDICT r4 #8).

Catalyst evaluates HOF lambdas interpreted (outside whole-stage codegen)
with no common-subexpression elimination, so an expensive expression that
does not depend on the lambda variable — a regex ``split``, a
``regexp_extract_all``, a nested HOF over a non-staged column — inside a
lambda body re-executes once **per array element** instead of once per
row: O(L) work becomes O(L**2). Round 4 found six such sites by timing
(``repetition_scores`` was 40x slower than necessary); this lint finds
the pattern structurally in the OPTIMIZED plan, so the next one is
caught at commit time instead of by a profiler.

The rule is precise, not a heuristic count: inside every
``lambdafunction(body, lambda v1, [lambda v2,] hidden)`` node of
``df.queryExecution().optimizedPlan()``, an expensive call whose
balanced-paren argument list references **none** of the lambda's own
variables (nor any enclosing lambda's variables — loop-dependent at any
depth is legitimate per-element work) is loop-invariant and should have
been staged as a column below the HOF. Per-element work that genuinely
needs the element (``filter(toks, t -> t rlike ...)``) references the
variable and passes.

Wired into ``plans.report`` (an EXPLAIN.md section over every driver
query) and ``tests/test_expression_staging.py``.
"""

from __future__ import annotations

# Calls that are expensive enough that re-evaluating one per array
# element turns a map stage quadratic: regex compilers/matchers, the
# tokenizing split, and every HOF (a loop-invariant HOF inside a lambda
# is a nested full-array pass per element).
EXPENSIVE_CALLS = (
    "split(",
    "regexp_extract_all(",
    "regexp_extract(",
    "regexp_replace(",
    "regexp_count(",
    "regexp_substr(",
    "rlike(",
    "like(",
    "sentences(",
    "transform(",
    "aggregate(",
    "reduce(",
    "filter(",
    "exists(",
    "forall(",
    "zip_with(",
    "array_sort(",
    "sort_array(",
    "array_distinct(",
    "arrays_zip(",
    "xxhash64(",
    "md5(",
    "sha2(",
)


def _balanced_end(s: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at ``s[open_idx]``."""
    depth = 0
    for i in range(open_idx, len(s)):
        c = s[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    return len(s)


def _split_top_level(s: str) -> list[str]:
    """Split an argument list on top-level commas."""
    parts, depth, start = [], 0, 0
    for i, c in enumerate(s):
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return parts


def _lambda_sites(plan: str):
    """Yield ``(body, var_tokens)`` for every lambdafunction node.

    ``var_tokens`` includes the variables of ALL enclosing lambdas: an
    expression that depends on an outer lambda's variable is still
    loop-dependent, not invariant. Implemented by scanning outside-in
    and attributing enclosing scopes by span containment.
    """
    sites: list[tuple[int, int, str, list[str]]] = []  # (start, end, body, vars)
    i = 0
    marker = "lambdafunction("
    while True:
        j = plan.find(marker, i)
        if j < 0:
            break
        open_idx = j + len(marker) - 1
        end = _balanced_end(plan, open_idx)
        inner = plan[open_idx + 1 : end - 1]
        args = _split_top_level(inner)
        body = args[0]
        vars_ = []
        for a in args[1:]:
            a = a.strip()
            if a in ("true", "false"):
                continue  # the trailing `hidden` flag
            vars_.append(a.removeprefix("lambda ").strip())
        sites.append((j, end, body, vars_))
        i = open_idx + 1  # keep scanning inside: nested lambdas get sites too
    for start, end, body, vars_ in sites:
        scope = list(vars_)
        for s2, e2, _, v2 in sites:
            if s2 < start and end <= e2:  # enclosing lambda
                scope.extend(v2)
        yield body, scope


def _call_sites(body: str):
    """Yield ``(name, arg_span_str)`` for every EXPENSIVE_CALLS hit with a
    word boundary before the name (so ``regexp_extract_all(`` is not also
    reported as ``regexp_extract(`` and ``_split(`` never matches)."""
    for marker in EXPENSIVE_CALLS:
        k = 0
        while True:
            m = body.find(marker, k)
            if m < 0:
                break
            before = body[m - 1] if m > 0 else " "
            open_idx = m + len(marker) - 1
            end = _balanced_end(body, open_idx)
            if not (before.isalnum() or before == "_"):
                yield marker[:-1], body[m:end]
            k = open_idx + 1


def lint_plan(plan: str) -> list[str]:
    """Return findings (empty = clean) for an optimizedPlan string."""
    findings: list[str] = []
    seen: set[str] = set()
    for body, scope in _lambda_sites(plan):
        for name, call in _call_sites(body):
            if any(v and v in call for v in scope):
                continue  # references a lambda variable: per-element by design
            key = call[:160]
            if key in seen:
                continue  # the same inlined expr repeated across plan nodes
            seen.add(key)
            findings.append(
                f"loop-invariant `{name}` inside a lambda body — stage it as "
                f"a column below the HOF: {key}"
            )
    return findings


def lint(df) -> list[str]:
    """Lint a DataFrame's optimized plan for non-staged lambda work."""
    return lint_plan(df._jdf.queryExecution().optimizedPlan().toString())
