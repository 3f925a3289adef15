"""J7 fuzzy matcher vs a serial oracle reimplementing the reference's
pool-removal loops (scripts/sort_logs.py:163-217, 248-278)."""

import numpy as np
import pandas as pd
import pytest

from logcrawler_ray.stages.fuzzymatch import (
    assign_first_match,
    assign_unique_with_removal,
    compile_games,
    match_pairs,
)

KEYS = {"Berlin United": ["berlin"], "Rockets": ["rocket"], "Whales": ["whale"]}
GAMES = [
    {"game_idx": 0, "date": "2024-01-01", "home": "Berlin United", "away": "Rockets"},
    {"game_idx": 1, "date": "2024-01-01", "home": "Berlin United", "away": "Whales"},
    {"game_idx": 2, "date": "2024-01-02", "home": "Berlin United", "away": "Rockets"},
]


def serial_candidate_matches(fname, game):
    """candiate_matches (sort_logs.py:163-171), KeyError -> no match."""
    if game["date"] not in fname:
        return False
    try:
        ks = KEYS[game["home"]] + KEYS[game["away"]]
    except KeyError:
        return False
    return all(k.casefold() in fname.casefold() for k in ks)


def serial_find_gc(cands, games):
    """find_gc_logs (sort_logs.py:193-199): per game in order, remove every
    matching candidate from the pool."""
    pool = list(enumerate(cands))
    out = []
    for g in games:
        keep = []
        for cid, f in pool:
            if serial_candidate_matches(f, g):
                out.append((cid, g["game_idx"]))
            else:
                keep.append((cid, f))
        pool = keep
    return sorted(out)


def serial_find_game_logs(cands, games, own=("Berlin United", "DoBerMan")):
    """find_game_logs (sort_logs.py:248-278): unique-match-then-remove."""
    pool = list(enumerate(cands))
    out = []
    for g in games:
        opp = g["home"] if g["home"] not in own else g["away"]
        try:
            ks = KEYS[opp]
        except KeyError:
            continue
        cs = [(cid, f) for cid, f in pool
              if g["date"] in f
              and all(k.casefold() in f.casefold() for k in ks)
              and "test" not in f.casefold()]
        if len(cs) == 1:
            out.append((cs[0][0], g["game_idx"]))
            pool.remove(cs[0])
    return out


CANDS = [
    "2024-01-01_berlin_vs_rocket_1st",   # g0
    "2024-01-01_berlin_whale_2nd",       # g1
    "2024-01-02_berlin_rocket_1st",      # g2
    "2024-01-02_berlin_ROCKET_rematch",  # g2 too -> ambiguity in vs-mode
    "2024-01-01_Test_berlin_rocket",     # gc: matches g0; vs: excluded
    "nothing_interesting",
]


def test_gc_mode_matches_serial_oracle(ray_session):
    import ray.data as rd

    specs = compile_games(GAMES, KEYS, mode="gc")
    cands_ds = rd.from_items(
        [{"cand_id": i, "fname": f} for i, f in enumerate(CANDS)])
    got = assign_first_match(match_pairs(cands_ds, specs))
    expect = serial_find_gc(CANDS, GAMES)
    assert list(zip(got["cand_id"], got["game_idx"])) == expect
    # the Test candidate DOES match in gc mode (no exclusion there)
    assert (got["cand_id"] == 4).any()


def test_vs_mode_unique_removal_matches_serial(ray_session):
    import ray.data as rd

    specs = compile_games(GAMES, KEYS, mode="vs")
    cands_ds = rd.from_items(
        [{"cand_id": i, "fname": f} for i, f in enumerate(CANDS)])
    pairs = match_pairs(cands_ds, specs).to_pandas()
    got = assign_unique_with_removal(pairs, [g["game_idx"] for g in GAMES])
    expect = serial_find_game_logs(CANDS, GAMES)
    assert list(zip(got["cand_id"], got["game_idx"])) == expect
    # game 2 has TWO live candidates -> ambiguous -> claims nothing
    assert 2 not in set(got["game_idx"])


def test_removal_enables_later_unique(ray_session):
    """A candidate claimed by an earlier game makes a later game unique —
    the sequential-pool property a pure per-candidate rule would miss."""
    import ray.data as rd

    games = [
        {"game_idx": 0, "date": "2024-01-01", "home": "Berlin United", "away": "Rockets"},
        {"game_idx": 1, "date": "2024-01-01", "home": "Berlin United", "away": "Rockets"},
    ]
    cands = ["2024-01-01_rocket_a", "2024-01-01_rocket_b"]
    specs = compile_games(games, KEYS, mode="vs")
    ds = rd.from_items([{"cand_id": i, "fname": f} for i, f in enumerate(cands)])
    pairs = match_pairs(ds, specs).to_pandas()
    got = assign_unique_with_removal(pairs, [0, 1])
    expect = serial_find_game_logs(cands, games)
    assert list(zip(got["cand_id"], got["game_idx"])) == expect == []
    # both games match both candidates -> never unique -> nothing claimed


def test_keyless_team_never_matches(ray_session):
    import ray.data as rd

    games = [{"game_idx": 0, "date": "2024-01-01",
              "home": "Berlin United", "away": "Mystery FC"}]
    specs = compile_games(games, KEYS, mode="gc")
    ds = rd.from_items([{"cand_id": 0, "fname": "2024-01-01_berlin_mystery"}])
    assert len(match_pairs(ds, specs).to_pandas()) == 0