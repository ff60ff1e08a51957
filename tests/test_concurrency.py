"""Concurrent optimistic commits — the round-1 advisory was a lost-update
bug (append retried with a stale entry list).  Appends from many threads
must all land: no dropped files, no duplicated rows."""

import threading


def test_concurrent_appends_no_lost_update(catalog):
    t = catalog.create_table("cc", schema={"w": "int", "i": "int"})
    n_writers, rows_each = 6, 5
    errors = []

    def writer(w):
        try:
            handle = catalog.load_table("cc")
            for i in range(rows_each):
                handle.append([{"w": w, "i": i}])
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(n_writers)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    t = t.refresh()
    rows = t.to_a()
    assert len(rows) == n_writers * rows_each
    got = {(r["w"], r["i"]) for r in rows}
    assert got == {(w, i) for w in range(n_writers) for i in range(rows_each)}
    # every append produced its own snapshot
    assert len(t.snapshots) == n_writers * rows_each


def test_concurrent_ref_and_append(catalog):
    t = catalog.create_table("cr", schema={"a": "int"})
    t.append([{"a": 0}])
    errors = []

    def tagger():
        try:
            h = catalog.load_table("cr")
            for i in range(5):
                h.create_tag(f"tag{i}")
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    def appender():
        try:
            h = catalog.load_table("cr")
            for i in range(1, 6):
                h.append([{"a": i}])
        except Exception as exc:  # pragma: no cover
            errors.append(exc)

    th1, th2 = threading.Thread(target=tagger), threading.Thread(target=appender)
    th1.start(); th2.start(); th1.join(); th2.join()
    assert not errors, errors
    t = t.refresh()
    assert len(t.to_a()) == 6
    assert {f"tag{i}" for i in range(5)} <= set(t.refs)


def test_concurrent_append_during_delete_not_lost(catalog):
    """A delete planned against snapshot A must not drop files a
    concurrent append committed between planning and commit (replace-mode
    rebase)."""
    t = catalog.create_table("cd", schema={"a": "int"})
    t.append([{"a": i} for i in range(10)])

    h_del = catalog.load_table("cd")   # plans against the 10-row snapshot
    h_app = catalog.load_table("cd")
    # interleave: append lands AFTER the delete handle loaded its metadata
    h_app.append([{"a": 100}])
    n = h_del.delete_where("a < 3")
    assert n == 3
    t = t.refresh()
    got = sorted(r["a"] for r in t.to_a())
    assert got == [3, 4, 5, 6, 7, 8, 9, 100]  # concurrent append survived


def test_concurrent_compact_and_append_not_lost(catalog):
    t = catalog.create_table("cc2", schema={"a": "int"})
    for i in range(3):
        t.append([{"a": i}])
    h_cmp = catalog.load_table("cc2")
    h_app = catalog.load_table("cc2")
    h_app.append([{"a": 99}])
    h_cmp.compact()
    t = t.refresh()
    assert sorted(r["a"] for r in t.to_a()) == [0, 1, 2, 99]
