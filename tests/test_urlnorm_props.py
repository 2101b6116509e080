"""Property-based tests for URL canonicalization (the crawl identity
function): idempotence, equivalence-class collapse, and total coverage
over adversarial inputs. Pure pandas/pyarrow — no SparkSession — so the
properties run hundreds of generated cases in seconds."""

from __future__ import annotations

import string

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from crunchy_spark.urlnorm import canonicalize_one, canonicalize_series, host_series

_LABEL = st.text(alphabet=string.ascii_letters + string.digits, min_size=1, max_size=8)
_SEG = st.text(
    alphabet=string.ascii_letters + string.digits + "-_~%", min_size=1, max_size=8
)


@st.composite
def urls(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https", "ftp"]))
    www = draw(st.sampled_from(["", "www.", "WWW."]))
    host = ".".join(draw(st.lists(_LABEL, min_size=1, max_size=3)))
    port = draw(st.sampled_from(["", ":80", ":443", ":8080"]))
    segs = draw(st.lists(_SEG, min_size=0, max_size=4))
    path = "".join("/" + s for s in segs)
    trail = draw(st.sampled_from(["", "/", "//"]))
    query = draw(st.sampled_from(["", "?a=1&b=2", "?utm_source=x"]))
    frag = draw(st.sampled_from(["", "#sec", "#"]))
    ws = draw(st.sampled_from(["", " ", "\t"]))
    return f"{ws}{scheme}://{www}{host}{port}{path}{trail}{query}{frag}{ws}"


@settings(max_examples=300, deadline=None)
@given(urls())
def test_canonicalize_idempotent_on_urls(u):
    c = canonicalize_one(u)
    assert canonicalize_one(c) == c


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_canonicalize_total_and_idempotent_on_noise(s):
    # arbitrary text must never raise, and the fallback (trim+lower)
    # must itself be a fixpoint
    c = canonicalize_one(s)
    assert isinstance(c, str)
    assert canonicalize_one(c) == c


@settings(max_examples=200, deadline=None)
@given(urls())
def test_equivalence_variants_collapse(u):
    # query, fragment, trailing slash, case, surrounding whitespace are
    # all identity-irrelevant: adding them to an already-canonical URL
    # must not change the fingerprint input
    c = canonicalize_one(u)
    if "://" not in c:
        return
    scheme, rest = c.split("://", 1)
    hostport, sep, path = rest.partition("/")
    case_variant = scheme.upper() + "://" + hostport.upper() + sep + path
    for variant in (
        c + "?tracking=1",
        c + "#frag",
        c + "/",
        " " + c + " ",
        case_variant,  # scheme+host case-insensitive; path case preserved
    ):
        assert canonicalize_one(variant) == canonicalize_one(c), variant


@settings(max_examples=200, deadline=None)
@given(
    st.sampled_from(["http", "https"]),
    _LABEL,
    st.lists(_SEG, min_size=1, max_size=3),
    _SEG,
)
def test_dot_segments_resolve(scheme, host, segs, extra):
    base = f"{scheme}://{host}" + "".join("/" + s for s in segs)
    plain = canonicalize_one(base)
    dotted = f"{scheme}://{host}/" + "/./".join(segs)
    updown = f"{scheme}://{host}" + "".join(
        "/" + s for s in segs[:-1]
    ) + f"/{extra}/../{segs[-1]}"
    assert canonicalize_one(dotted) == plain
    assert canonicalize_one(updown) == plain


@settings(max_examples=100, deadline=None)
@given(st.lists(urls(), min_size=1, max_size=20))
def test_series_matches_scalar_path(batch):
    # the vectorized kernel (fast path + slow-path scatter) must agree
    # with one-at-a-time application — guards the slow_mask alignment
    out = canonicalize_series(pd.Series(batch))
    for u, got in zip(batch, out):
        assert got == canonicalize_one(u)


@settings(max_examples=200, deadline=None)
@given(urls())
def test_host_of_canonical_has_no_port_or_www(u):
    c = canonicalize_one(u)
    if "://" not in c:
        return
    h = host_series(pd.Series([c])).iloc[0]
    assert not h.startswith("www.")
    assert ":" not in h
    assert h == h.lower()
