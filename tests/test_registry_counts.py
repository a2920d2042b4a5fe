"""Pin the documented query counts to the registry so README can't
drift from `plans/queries.py` again (it said 214 while the registry had
216). The README line is the single place the counts appear in prose."""

import re
from pathlib import Path

from hudi_demo_spark.plans import ORACLES, QUERIES

README = Path(__file__).resolve().parent.parent / "README.md"


def test_readme_query_counts_match_registry():
    text = README.read_text()
    m = re.search(r"(\d+) named queries, (\d+) with", text)
    assert m, "README no longer states the query counts"
    assert int(m.group(1)) == len(QUERIES), (
        f"README says {m.group(1)} queries; registry has {len(QUERIES)}"
    )
    assert int(m.group(2)) == len(ORACLES), (
        f"README says {m.group(2)} oracled; registry has {len(ORACLES)}"
    )


# The only registry names allowed in the head WITHOUT an oracle: the
# rows-only-by-design gates (recall floors / throughput measurements
# whose assertions live inside the gate, not in SQL). Round 10 rotates
# them through the driver sample once to close the verification ledger;
# any OTHER unoracled name in the head is a mistake.
ROWS_ONLY_BY_DESIGN = {
    "text_bpe_token_counts",
    "multimodal_jpeg_throughput",
    "ann_pq_recall",
    "ann_ivfpq_recall",
    "ann_indexed_pq_recall",
}


def test_rotation_head_is_well_formed():
    """The driver samples the first 50 registry entries: the rotated
    head must be EXACTLY 50 distinct registered names (a 52-entry list
    would silently drop its tail out of the driver sample — round-8
    near-miss), every one oracled unless declared rows-only."""
    from hudi_demo_spark.plans.queries import _ROTATION_HEAD

    assert len(_ROTATION_HEAD) == 50, (
        f"rotation head has {len(_ROTATION_HEAD)} names; the driver "
        "samples exactly the first 50 — trim or fill the list"
    )
    names = list(QUERIES)
    head = names[:50]
    assert head == _ROTATION_HEAD
    assert len(set(head)) == 50
    missing = [
        n for n in head if n not in ORACLES and n not in ROWS_ONLY_BY_DESIGN
    ]
    assert not missing, f"head queries without oracle SQL: {missing}"
