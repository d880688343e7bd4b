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
