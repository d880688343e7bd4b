"""Property tests for the schema-evolution algebra (round 12) —
driver-side only (no Spark), so hypothesis can run hundreds of cases:

1. check_schema_evolution is a partial order: evolve-accepted chains
   compose (if A->B and B->C are accepted, A->C is), identity is
   always accepted in both modes, and order/nullability permutations
   never count as drift.
2. Acceptance is exactly characterized: evolve accepts (old ⊆ new by
   name) AND (each shared column same-type or widenable); strict
   accepts exactly the same-field-map case.
3. Widening is a strict order: irreflexive, antisymmetric, transitive
   over the declared chain — so a reconciled cast can never be lossy
   and evolution can never oscillate a column's type.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from map_reduce_indexing_spark.sources.generations import (
    SchemaEvolutionError,
    _type_widens,
    check_schema_evolution,
)

_TYPES = ["byte", "short", "integer", "long", "float", "double", "string",
          "boolean", "date", "timestamp"]
_NAMES = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=4),
    min_size=1,
    max_size=6,
    unique=True,
)


def _schema(names, types, nullables):
    return {
        "type": "struct",
        "fields": [
            {"name": n, "type": t, "nullable": bool(b), "metadata": {}}
            for n, t, b in zip(names, types, nullables)
        ],
    }


@st.composite
def schemas(draw):
    names = draw(_NAMES)
    types = [draw(st.sampled_from(_TYPES)) for _ in names]
    nulls = [draw(st.booleans()) for _ in names]
    return _schema(names, types, nulls)


def _accepts(old, new, mode) -> bool:
    try:
        check_schema_evolution(old, new, mode)
        return True
    except SchemaEvolutionError:
        return False


def _fields(sj):
    return {f["name"]: f["type"] for f in sj["fields"]}


@settings(max_examples=300, deadline=None)
@given(schemas(), st.randoms())
def test_identity_and_permutation_always_accepted(sj, rng):
    assert _accepts(sj, sj, "strict")
    assert _accepts(sj, sj, "evolve")
    # shuffled field order + flipped nullability is NOT drift
    fields = list(sj["fields"])
    rng.shuffle(fields)
    perm = {
        "type": "struct",
        "fields": [
            {**f, "nullable": not f["nullable"], "metadata": {}}
            for f in fields
        ],
    }
    assert _accepts(sj, perm, "strict")


@settings(max_examples=300, deadline=None)
@given(schemas(), schemas(), st.sampled_from(["strict", "evolve"]))
def test_acceptance_exactly_characterized(old, new, mode):
    of, nf = _fields(old), _fields(new)
    if mode == "strict":
        want = of == nf
    else:
        want = all(
            n in nf and (nf[n] == t or _type_widens(t, nf[n]))
            for n, t in of.items()
        )
    assert _accepts(old, new, mode) == want


@settings(max_examples=300, deadline=None)
@given(schemas(), schemas(), schemas())
def test_evolve_chains_compose(a, b, c):
    if _accepts(a, b, "evolve") and _accepts(b, c, "evolve"):
        assert _accepts(a, c, "evolve")


def test_widening_is_a_strict_order():
    for t in _TYPES:
        assert not _type_widens(t, t)  # irreflexive
    for a in _TYPES:
        for b in _TYPES:
            if _type_widens(a, b):
                assert not _type_widens(b, a)  # antisymmetric
            for c in _TYPES:
                if _type_widens(a, b) and _type_widens(b, c):
                    assert _type_widens(a, c)  # transitive
    # the exact declared relation
    assert _type_widens("byte", "long")
    assert _type_widens("integer", "long")
    assert _type_widens("float", "double")
    assert not _type_widens("long", "double")  # lossy: refused
    assert not _type_widens("integer", "double")
    assert not _type_widens("string", "long")


# ---- rename algebra (round 13) ---------------------------------------


@settings(max_examples=300, deadline=None)
@given(schemas(), st.data())
def test_rename_chain_resolution(sj, data):
    """_physical_name walks a linear rename chain from any later
    logical name back to the physical name an old file carries;
    un-renamed names short-circuit to themselves; unknown names
    resolve to None (NULL-fill)."""
    from map_reduce_indexing_spark.sources.generations import (
        _physical_name,
    )

    names = [f["name"] for f in sj["fields"]]
    orig = data.draw(st.sampled_from(names))
    k = data.draw(st.integers(min_value=1, max_value=4))
    renames = {}
    cur = orig
    for i in range(k):  # z-prefixed: disjoint from the a-h alphabet
        nxt = f"z{i}_{orig}"
        renames[nxt] = cur
        cur = nxt
    assert _physical_name(cur, names, renames) == orig
    other = data.draw(st.sampled_from(names))
    if other != orig:
        assert _physical_name(other, names, renames) == other
    assert _physical_name("qqqq", names, renames) is None


@settings(max_examples=300, deadline=None)
@given(schemas(), st.data())
def test_rename_then_widen_composes(sj, data):
    """rename . widen: the evolve gate accepts a widened batch against
    the RENAMED declared schema, and the retired original name can
    never re-enter."""
    from hypothesis import assume

    widenable = [
        f
        for f in sj["fields"]
        if f["type"] in ("byte", "short", "integer", "float")
    ]
    assume(widenable)
    fld = data.draw(st.sampled_from(widenable))
    new_name = "zz_" + fld["name"]
    renamed = {
        "type": "struct",
        "fields": [
            {**f, "name": new_name if f["name"] == fld["name"] else f["name"]}
            for f in sj["fields"]
        ],
    }
    wider = {"byte": "long", "short": "long", "integer": "long",
             "float": "double"}[fld["type"]]
    widened = {
        "type": "struct",
        "fields": [
            {**f, "type": wider if f["name"] == new_name else f["type"]}
            for f in renamed["fields"]
        ],
    }
    out = check_schema_evolution(
        renamed, widened, "evolve", retired={fld["name"]}
    )
    assert _fields(out) == _fields(widened)
    sneaky = {
        "type": "struct",
        "fields": widened["fields"]
        + [{"name": fld["name"], "type": "string", "nullable": True,
            "metadata": {}}],
    }
    try:
        check_schema_evolution(
            renamed, sneaky, "evolve", retired={fld["name"]}
        )
        raise AssertionError("retired name re-add must refuse")
    except SchemaEvolutionError:
        pass
