"""BlendedInfixSuggester traced from the reference's
TestBlendedInfixSuggester (`suggest/src/test/.../analyzing/
TestBlendedInfixSuggester.java`): position-coefficient ranking across the
three blender types, the small/zero/huge weight adjustments, and the
num_factor candidate widening."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.search.suggest import Suggester, build_suggester

TITLE = "star wars: episode v - the empire strikes back"


def _store(tmp_path, rows):
    import ray.data as rd

    t = pa.table({"text": [r[0] for r in rows],
                  "weight": pa.array([r[1] for r in rows], type=pa.int64())})
    d = str(tmp_path / "blended")
    build_suggester(rd.from_arrow(t), d)
    return Suggester(d)


@pytest.fixture(scope="module")
def star(ray_session, tmp_path_factory):
    return _store(tmp_path_factory.mktemp("bl"), [(TITLE, 8)])


def _w(sugg, q, **kw):
    res = sugg.lookup_blended(q, num=1, **kw)
    return res[0][1] if res else -1


@pytest.mark.parametrize("weight", [8, 1, 0, 2**62])
def test_blended_sort_ranking(ray_session, tmp_path_factory, weight):
    """assertSuggestionsRanking: scores shrink as the first matching token
    moves right; unmatched queries return nothing — for unit, zero and
    huge weights alike (testBlendedSort*)."""
    s = _store(tmp_path_factory.mktemp(f"bl{weight}"), [(TITLE, weight)])
    w0 = _w(s, "star ")
    w1 = _w(s, "war")
    w2 = _w(s, "empire ba")
    w3 = _w(s, "back")
    w4 = _w(s, "bacc")
    assert w0 > w1 > w2 > w3
    assert w4 == -1                        # not found


def test_linear_coefficients_exact(star):
    # weight 8 < 10 scales to 80; analyzed token positions: star=0 wars=1
    # episode=2 v=3 the=4 empire=5 strikes=6 back=7; linear coef =
    # 1 - 0.1*pos with Java's double math (0.1*7 -> 0.70000000000000007,
    # so 'back' scores (long)(80*0.2999...) = 23, exactly the reference)
    assert _w(star, "star") == 80          # 80 * 1.0
    assert _w(star, "war") == 72           # 80 * 0.9
    assert _w(star, "empire ba") == 40     # first match pos 5 -> 0.5
    assert _w(star, "back") == 23          # 80 * (1 - 0.1*7) truncated


def test_reciprocal_and_exponential(star):
    kw = dict(blender_type="position_reciprocal")
    assert _w(star, "star", **kw) == 80            # 80 / 1
    assert _w(star, "war", **kw) == 40             # 80 / 2
    assert _w(star, "back", **kw) == 10            # 80 / 8
    kw = dict(blender_type="position_exponential_reciprocal", exponent=2.0)
    assert _w(star, "war", **kw) == 20             # 80 / 4
    assert _w(star, "back", **kw) == 1             # 80 / 64 -> 1


def test_weight_adjustments(ray_session, tmp_path_factory):
    s = _store(tmp_path_factory.mktemp("blw"),
               [("alpha beta", 0), ("alpha gamma", 25)])
    got = dict(s.lookup_blended("alpha", num=5))
    assert got["alpha gamma"] == 25        # >= 10: unscaled
    assert got["alpha beta"] == 10         # 0 -> 1 -> x10


def test_num_factor_widens_before_blending(ray_session, tmp_path_factory):
    """A low-weight suggestion with an early match must beat heavy
    late-match ones after blending — it only can if candidates are
    fetched num*num_factor deep (the reference's numFactor contract)."""
    rows = [(f"filler{i} word{i} target end{i}", 100 + i) for i in range(12)]
    rows.append(("target first thing", 3))   # weight 3 -> 30, pos 0 -> 30
    s = _store(tmp_path_factory.mktemp("blnf"), rows)
    # heavy rows match 'target' at position 2 -> coef 0.8 -> ~88..89
    top = s.lookup_blended("target", num=1, num_factor=13)
    assert top[0][0].startswith("filler")  # 89 beats 30
    # but with reciprocal blending pos 0 wins only if it survives the cut
    got = s.lookup_blended("target", num=13, num_factor=13)
    assert any(sf == "target first thing" for sf, _ in got)


def test_lookup_infix_all_terms_required(star):
    assert star.lookup_infix("empire str") == [(TITLE, 8)]
    assert star.lookup_infix("empire zz") == []
    assert star.lookup_infix("the empire") == [(TITLE, 8)]

def test_file_dictionary_adapter(ray_session, tmp_path):
    """FileDictionary lines (term<TAB>weight, missing weight = 1) feed the
    suggester store; lookups rank by weight."""
    from lucene_ray.search.suggest import Suggester, build_suggester_from_file

    f = tmp_path / "dict.txt"
    f.write_text("merge sort\t50\nmerge join\t90\nmerge\n\nscan\t10\n")
    d = str(tmp_path / "fdict")
    build_suggester_from_file(str(f), d)
    s = Suggester(d)
    got = s.lookup("merge", 5, exact_first=False)
    assert got[0] == ("merge join", 90)
    assert ("merge sort", 50) in got
    assert ("merge", 1) in got
    assert all(sf != "scan" for sf, _w in got)
