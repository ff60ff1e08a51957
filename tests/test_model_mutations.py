"""Model-based mutation testing: random interleavings of every mutation
kind against a plain-Python dict model of the table.

Each step picks an operation (append / delete in any of the four modes /
update in CoW or either MoR flavor / compact / snapshot expiry) with
randomized predicates, applies it to BOTH the engine and the model, and
asserts the engine's visible rows equal the model exactly.  Three seeds
× a dozen steps cover interleavings no hand-written scenario does —
especially MoR artifacts stacking on each other (a DV on top of
positional deletes on top of a predicate entry, then compacted away).
"""

from __future__ import annotations

import random

DELETE_MODES = [
    "copy-on-write",
    "merge-on-read",             # predicate entry
    "merge-on-read-positional",
    "merge-on-read-dv",
]
UPDATE_MODES = ["copy-on-write", "merge-on-read-positional", "merge-on-read-dv"]


def _run_model(catalog, seed: int, steps: int = 12) -> None:
    rnd = random.Random(seed)
    t = catalog.create_table(
        f"model_{seed}",
        schema={"k": "int", "v": "string"},
        properties={"format-version": "3"},
    )
    model: dict[int, str] = {}
    next_key = 0

    def check(step, op):
        got = {r["k"]: r["v"] for r in t.to_a()}
        assert got == model, (
            f"seed={seed} step={step} after {op}: engine != model "
            f"(missing={sorted(set(model) - set(got))[:5]}, "
            f"extra={sorted(set(got) - set(model))[:5]})"
        )

    # initial data
    batch = [{"k": i, "v": "v0"} for i in range(20)]
    t.append(batch)
    model.update({r["k"]: r["v"] for r in batch})
    next_key = 20
    check(-1, "seed append")

    for step in range(steps):
        op = rnd.choice(["append", "delete", "delete", "update", "update",
                         "compact", "expire"])
        if op == "append":
            n = rnd.randrange(1, 8)
            batch = [{"k": next_key + i, "v": f"a{step}"} for i in range(n)]
            next_key += n
            t.append(batch)
            model.update({r["k"]: r["v"] for r in batch})
        elif op == "delete":
            mode = rnd.choice(DELETE_MODES)
            m, r = rnd.randrange(3, 7), rnd.randrange(0, 3)
            cond = f"k % {m} = {r}"
            deleted = t.delete_where(cond, mode=mode)
            dead = [k for k in model if k % m == r]
            assert deleted == len(dead), (seed, step, mode, cond)
            for k in dead:
                del model[k]
            op = f"delete[{mode}] {cond}"
        elif op == "update":
            mode = rnd.choice(UPDATE_MODES)
            m, r = rnd.randrange(3, 7), rnd.randrange(0, 3)
            cond = f"k % {m} = {r}"
            val = f"u{step}"
            updated = t.update_where({"v": f"'{val}'"}, cond, mode=mode)
            hit = [k for k in model if k % m == r]
            assert updated == len(hit), (seed, step, mode, cond)
            for k in hit:
                model[k] = val
            op = f"update[{mode}] {cond}"
        elif op == "compact":
            t.compact()
        else:
            t.expire_snapshots(keep_last=2)
        check(step, op)


def test_model_random_mutation_interleavings(catalog):
    for seed in (7, 23, 91):
        _run_model(catalog, seed)
