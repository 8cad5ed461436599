"""Highlighter Formatter surface (`highlight/GradientFormatter.java`,
`SpanGradientFormatter.java`, `SimpleHTMLFormatter.java`,
`SimpleHTMLEncoder.java`) — color math + encoder + plug-in rendering."""

import pytest

from lucene_ray.search.highlight import (
    GradientFormatter,
    SimpleHTMLFormatter,
    SpanGradientFormatter,
    highlight,
    simple_html_encode,
)


def test_gradient_color_math():
    f = GradientFormatter(1.0, "#000000", "#FF0000", None, None)
    # score 0.5 -> halfway: 0 + int(255*0.5) = 127 -> 7F
    assert f.foreground_color_string(0.5) == "#7F0000"
    assert f.foreground_color_string(0.0) == "#000000"
    # scores above max clamp to the max color
    assert f.foreground_color_string(5.0) == "#FF0000"
    # descending ranges interpolate from the smaller bound up
    g = GradientFormatter(1.0, "#FFFFFF", "#000000", None, None)
    assert g.foreground_color_string(0.5) == "#7F7F7F"
    assert g.foreground_color_string(1.0) == "#FFFFFF"
    # equal min/max short-circuits
    h = GradientFormatter(1.0, "#123456", "#123456", None, None)
    assert h.foreground_color_string(0.7) == "#123456"
    with pytest.raises(ValueError):
        GradientFormatter(1.0, "#FFF", "#000000", None, None)


def test_gradient_highlight_term():
    f = GradientFormatter(1.0, None, None, "#FFFFFF", "#0000FF")
    out = f.highlight_term("merge", 1.0)
    # min #FFFFFF -> max #0000FF: R,G interpolate down-range from 0x00
    assert out == '<font bgcolor="#FFFFFF" >merge</font>'
    assert f.highlight_term("merge", 0.0) == "merge"
    mid = f.background_color_string(0.5)
    assert mid == "#7F7FFF"
    # zero score passes through
    assert f.highlight_term("merge", 0.0) == "merge"
    s = SpanGradientFormatter(1.0, "#000000", "#FF0000", None, None)
    assert s.highlight_term("merge", 0.5) == \
        '<span style="color: #7F0000; ">merge</span>'
    assert s.highlight_term("merge", 0) == "merge"


def test_simple_html():
    f = SimpleHTMLFormatter()
    assert f.highlight_term("x") == "<B>x</B>"
    assert SimpleHTMLFormatter("<em>", "</em>").highlight_term("x") == \
        "<em>x</em>"
    assert simple_html_encode('a<b>&"c\'/d') == \
        "a&lt;b&gt;&amp;&quot;c&#x27;&#x2F;d"


def test_formatter_plugs_into_highlight():
    text = "first we merge then we join the tables"
    out = highlight(text, ["merge", "join"],
                    formatter=SpanGradientFormatter(
                        2.0, "#000000", "#FF0000", None, None),
                    term_scores={"merge": 2.0, "join": 1.0})
    assert '<span style="color: #FF0000; ">merge</span>' in out
    assert '<span style="color: #7F0000; ">join</span>' in out
    # default path unchanged
    assert "<b>merge</b>" in highlight(text, ["merge"])
