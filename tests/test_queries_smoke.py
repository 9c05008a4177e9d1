"""Every declared query runs at sf0.001 and returns rows with a stable
schema.  (Value correctness is scripts/check_oracle.py + the driver.)"""

import pytest

import __spark_entry__ as entry_mod


@pytest.mark.parametrize("key", sorted(entry_mod.queries().keys()))
def test_query_runs_nonempty(spark, sf_dir, key):
    df = entry_mod.queries()[key](spark, sf_dir)
    assert len(df.columns) > 0
    assert df.count() > 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"vec_id", "score", "rank"} <= set(df.columns)


def test_every_oracle_key_is_declared():
    assert set(entry_mod.oracle_sql()) <= set(entry_mod.queries())


def test_driver_priority_orders_unverified_first():
    """The driver checks only a prefix of queries() per round, so the
    ordering contract is what guarantees every key eventually gets a
    driver-verified row: keys with no prior CORRECTNESS row come first,
    then errored keys, then oracle-bearing rows-only keys, then
    hash-green keys whose fingerprint changed AFTER their newest green
    row (stale certification), then oracle-less rows-only keys, then
    unchanged hash-green keys.  Independent reimplementation of the
    tiering — not a call back into the module's rank function."""
    import glob
    import json
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    status, last_round = {}, {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(os.path.basename(path)[len("CORRECTNESS_r"):].split(".")[0])
        with open(path) as fh:
            for key, row in json.load(fh).items():
                if rnd < last_round.get(key, -1):
                    continue
                last_round[key] = rnd
                if row.get("hash_match"):
                    status[key] = "green"
                elif row.get("err") == "no_oracle":
                    status[key] = "rows_only"
                else:
                    status[key] = "fail"
    if not status:
        return  # fresh checkout: nothing to order against
    try:
        with open(os.path.join(repo, "KEY_FINGERPRINTS.json")) as fh:
            since = {k: v["since"] for k, v in json.load(fh).items()}
    except OSError:
        since = {}
    oracle_keys = set(entry_mod.oracle_sql())

    def tier(k):
        st = status.get(k)
        if st is None:
            return 0
        if st == "fail":
            return 1
        if st == "rows_only":
            return 2 if k in oracle_keys else 4
        return 3 if since.get(k, 0) > last_round.get(k, 0) else 5

    order = [tier(k) for k in entry_mod.queries()]
    assert order == sorted(order), "driver priority must be monotone"


def test_driver_priority_changed_keys_outrank_stale_green():
    """Changed-first pin: a hash-green key whose behavior fingerprint
    moved AFTER its newest green row must be re-verified ahead of
    merely-stale green keys and oracle-less rows-only keys — its old
    row certifies behavior that no longer exists (the round-9
    q_sql_tpch_q20 schema change was exactly this gap)."""
    status = {
        "k_new": None, "k_fail": "fail", "k_rowsonly_oracled": "rows_only",
        "k_changed": "green", "k_rowsonly_nature": "rows_only",
        "k_green_stale": "green", "k_green_fresh": "green",
    }
    status.pop("k_new")  # never seen => absent from status
    last_round = {
        "k_fail": 8, "k_rowsonly_oracled": 8, "k_changed": 7,
        "k_rowsonly_nature": 9, "k_green_stale": 7, "k_green_fresh": 9,
    }
    since = {"k_changed": 9}  # fingerprint moved after its r7 green row
    reg = [
        "k_green_fresh", "k_green_stale", "k_rowsonly_nature", "k_changed",
        "k_rowsonly_oracled", "k_fail", "k_new",
    ]
    got = entry_mod._rank_keys(
        reg, status, last_round, since, oracle_keys={"k_rowsonly_oracled"}
    )
    assert got == [
        "k_new", "k_fail", "k_rowsonly_oracled", "k_changed",
        "k_rowsonly_nature", "k_green_stale", "k_green_fresh",
    ]


def test_fingerprint_snapshot_tracks_source_changes(tmp_path, monkeypatch):
    """A key's `since` survives reloads while its fingerprint is stable
    and jumps to latest_correctness_round + 1 the moment the recorded
    fingerprint differs — the mechanism that feeds changed-first."""
    import json

    snap = tmp_path / "KEY_FINGERPRINTS.json"
    fps = entry_mod._fingerprints()
    assert set(fps) == set(entry_mod.queries())
    some = sorted(fps)[0]
    seeded = {k: {"fp": fp, "since": 0} for k, fp in fps.items()}
    seeded[some]["fp"] = "0" * 16  # simulate a source edit since the seed
    snap.write_text(json.dumps(seeded))
    monkeypatch.setattr(entry_mod, "_REPO", str(tmp_path))
    since, current_round = entry_mod._changed_since()
    assert since[some] == current_round  # changed key re-stamped
    others = [k for k in fps if k != some]
    assert all(since[k] == 0 for k in others)  # unchanged keys keep since
    rewritten = json.loads(snap.read_text())
    assert rewritten[some] == {"fp": fps[some], "since": current_round}
