"""Debug-category logging subsystem."""

import logging

from flutpu.core.log import Category, category, trace_span


def test_category_levels(monkeypatch):
    import flutpu.core.log as L
    monkeypatch.setattr(L, "_spec", {"testcat": 5, "*": 1})
    c = Category("testcat")
    assert c.logger.isEnabledFor(logging.DEBUG - 1)
    other = Category("quiet")
    assert not other.logger.isEnabledFor(logging.WARNING)


def test_memdump_runs(monkeypatch):
    import flutpu.core.log as L
    monkeypatch.setattr(L, "_spec", {"dumpcat": 7})
    c = Category("dumpcat")
    c.memdump("test", b"\x00\x01\xffABC" * 10)  # no exception


def test_trace_span_noop():
    with trace_span("x"):
        pass


def test_http_date():
    from flutpu.io import parse_http_date
    assert parse_http_date("Wed, 21 Oct 2015 07:28:00 GMT") == 1445412480
    assert parse_http_date("not a date") is None


def test_inspect_markdown_generates_all_elements():
    """docs/ELEMENTS.md generator covers every registered factory."""
    from flutpu.core import factories
    from flutpu.inspect import _markdown
    md = _markdown(factories())
    for name in factories():
        assert f"## `{name}`" in md, name
