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
