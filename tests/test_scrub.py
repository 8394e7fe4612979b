"""ScrubPII stage: RE2 kernel semantics, ordering contract, edge cases."""
import pyarrow as pa

from simplefeatures_ray.functions.text import ScrubPII


def run(rows):
    return ScrubPII()(pa.table({"text": pa.array(rows, pa.string())}))


def test_email_then_url_order():
    out = run(["http://x.io/path?u=a@b.co rest"])
    # contract: the embedded address is COUNTED as an email (emails pass
    # runs first), then the URL replacement consumes the whole token
    assert out["n_emails"].to_pylist() == [1]
    assert out["n_urls"].to_pylist() == [1]
    assert out["text_scrubbed"].to_pylist() == ["<URL> rest"]


def test_counts_and_content():
    out = run(["bob+x@ex.co and carol.d@y.org wrote https://z.dev/a b",
               "no pii here", ""])
    assert out["n_emails"].to_pylist() == [2, 0, 0]
    assert out["n_urls"].to_pylist() == [1, 0, 0]
    assert out["text_scrubbed"].to_pylist() == [
        "<EMAIL> and <EMAIL> wrote <URL> b", "no pii here", ""]


def test_unicode_and_boundaries():
    out = run(["café ö@x.de https://ü.example/p end", "trailing a@b.cc"])
    assert out["n_urls"].to_pylist()[0] == 1
    assert out["text_scrubbed"].to_pylist()[1] == "trailing <EMAIL>"
