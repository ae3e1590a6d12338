"""Model-based fuzz of the AliasRegistry atomic-batch protocol
(operators/store.py — Qdrant ``update_collection_aliases``): random op
batches (create / delete / rename, valid and invalid interleaved) against
a plain dict model applying the documented sequential semantics.

The property under test is ATOMICITY + sequential visibility: a batch
applies op-by-op against the evolving table (a rename can see a create
from the same batch), and a batch whose ANY op is invalid changes NOTHING
— the table after a failed batch is byte-identical to before, even when
earlier ops in that batch were valid.  That is the one place a naive
apply-then-validate implementation silently half-applies."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

NAMES = ["prod", "staging", "canary", "blue"]

_op = st.one_of(
    st.tuples(st.just("create"), st.sampled_from(NAMES), st.integers(0, 1)),
    st.tuples(st.just("delete"), st.sampled_from(NAMES)),
    st.tuples(st.just("rename"), st.sampled_from(NAMES), st.sampled_from(NAMES)),
)


def _model_apply(table: dict, ops, roots) -> dict:
    """The documented semantics, applied to a COPY; raises on any invalid
    op (the registry must then keep the original table untouched)."""
    t = dict(table)
    for op in ops:
        if op[0] == "create":
            t[op[1]] = roots[op[2]]
        elif op[0] == "delete":
            if op[1] not in t:
                raise ValueError
            del t[op[1]]
        else:
            _, old, new = op
            if old not in t:
                raise ValueError
            if new in t:
                raise ValueError
            t[new] = t.pop(old)
    return t


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(batches=st.lists(st.lists(_op, min_size=1, max_size=4),
                        min_size=1, max_size=5))
def test_alias_batches_apply_atomically_and_sequentially(
        spark, tmp_path_factory, batches):
    from robi_biometric_qdrant_vector_db_service_spark.operators.store import (
        AliasRegistry,
        VectorStore,
    )

    base = tmp_path_factory.mktemp("alias_fuzz")
    roots = []
    for i in range(2):
        root = str(base / f"store{i}")
        VectorStore.create(spark, root)
        roots.append(root)
    reg = AliasRegistry(spark, str(base / "reg"))

    model: dict[str, str] = {}
    for ops in batches:
        real = [("create", op[1], roots[op[2]]) if op[0] == "create" else op
                for op in ops]
        try:
            expected = _model_apply(model, ops, roots)
            ok = True
        except ValueError:
            ok = False
        if ok:
            got = reg.update_aliases(real)
            model = expected
            assert got == model
        else:
            with pytest.raises(ValueError):
                reg.update_aliases(real)
        # the on-disk table always equals the model — failed batches
        # change NOTHING even when their earlier ops were valid
        assert reg.aliases() == model
    # resolve() agrees with the final table
    for alias, root in model.items():
        assert reg.resolve(alias).root == root
