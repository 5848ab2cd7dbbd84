"""Hypothesis property tests for round-8 primitives: the box-filter
resampler against a numpy reference model, the WAV de-interleave against a
per-channel model, GtidSet algebra against a plain int-set model, and
_wire_value normalization invariants."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st


@st.composite
def _image(draw):
    factor = draw(st.integers(1, 4))
    nw = draw(st.integers(1, 6))
    nh = draw(st.integers(1, 6))
    ch = draw(st.sampled_from([1, 3]))
    w, h = nw * factor, nh * factor
    px = draw(
        st.binary(min_size=w * h * ch, max_size=w * h * ch)
    )
    return px, w, h, ch, factor


@given(_image())
@settings(max_examples=60, deadline=None)
def test_box_downsample_matches_numpy_model(img):
    from binwatch_spark.operators.multimodal import box_downsample

    px, w, h, ch, factor = img
    nw, nh, small = box_downsample(px, w, h, ch, factor)
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w, ch).astype(np.int64)
    pooled = (
        arr.reshape(nh, factor, nw, factor, ch).sum(axis=(1, 3))
        // (factor * factor)
    )
    assert (nw, nh) == (w // factor, h // factor)
    got = np.frombuffer(small, dtype=np.uint8).reshape(nh, nw, ch)
    assert (got == pooled).all()


@given(
    st.integers(1, 4),
    st.lists(st.integers(-32768, 32767), min_size=1, max_size=200),
)
@settings(max_examples=60, deadline=None)
def test_wav_features_matches_per_channel_model(channels, frames_flat):
    from binwatch_spark.operators.multimodal import wav_encode, wav_features

    # round length down to whole frames (the encoder takes the raw stream)
    n = (len(frames_flat) // channels) * channels
    if n == 0:
        return
    samples = frames_flat[:n]
    feats = wav_features(wav_encode(samples, channels=channels))
    frames = n // channels
    chans = [samples[c::channels] for c in range(channels)]
    crossings = sum(
        sum(1 for i in range(1, frames) if (cs[i - 1] < 0) != (cs[i] < 0))
        for cs in chans
    )
    assert feats[0] == float(frames)
    assert feats[2] == float(channels)
    assert feats[3] == sum(samples) / n
    assert feats[5] == float(crossings)
    assert feats[6] == float(min(samples)) and feats[7] == float(max(samples))


_UUIDS = [
    "3e11fa47-71ca-11e1-9e33-c80aa9429562",
    "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee",
]


@given(
    st.lists(
        st.tuples(st.sampled_from(_UUIDS), st.integers(1, 40)),
        min_size=0,
        max_size=30,
    ),
    st.tuples(st.sampled_from(_UUIDS), st.integers(1, 45)),
)
@settings(max_examples=80, deadline=None)
def test_gtid_set_algebra_matches_int_set_model(adds, probe):
    """with_gtid/contains/encode against a dict-of-int-sets model: adding
    txns one at a time always yields a canonical encoding that parses back
    to the same membership."""
    from binwatch_spark.sources.binlog import GtidSet

    gs = GtidSet.parse("")
    model: dict[str, set[int]] = {}
    for uuid, txid in adds:
        gs = gs.with_gtid(f"{uuid}:{txid}")
        model.setdefault(uuid, set()).add(txid)
    pu, pt = probe
    assert gs.contains(f"{pu}:{pt}") == (pt in model.get(pu, set()))
    # encode → parse round-trips membership
    reparsed = GtidSet.parse(gs.encode())
    for uuid, txids in model.items():
        for t in txids:
            assert reparsed.contains(f"{uuid}:{t}")
    # canonical: no interval abuts or overlaps its neighbor
    for part in filter(None, gs.encode().split(",")):
        _, _, rng = part.partition(":")
        bounds = [
            tuple(map(int, r.split("-"))) if "-" in r else (int(r), int(r))
            for r in rng.split(":")
        ]
        for (a1, b1), (a2, b2) in zip(bounds, bounds[1:]):
            assert b1 + 1 < a2, f"non-canonical intervals in {part}"


@given(st.binary(max_size=64))
@settings(max_examples=60, deadline=None)
def test_wire_value_bytes_always_reversible(b):
    """Any bytes payload maps to a string that recovers the exact original
    bytes: utf-8 decodable → the text itself re-encodes to it; otherwise
    base64 decodes back."""
    import base64

    from binwatch_spark.sources.binlog import _wire_value

    s = _wire_value(b)
    assert isinstance(s, str)
    try:
        b.decode("utf-8")
        assert s.encode("utf-8") == b
    except UnicodeDecodeError:
        assert base64.b64decode(s) == b


@given(
    st.recursive(
        st.one_of(
            st.none(),
            st.integers(-1000, 1000),
            st.text(max_size=8),
            st.booleans(),
        ),
        lambda children: st.one_of(
            st.lists(children, max_size=4),
            st.dictionaries(st.text(max_size=5), children, max_size=4),
        ),
        max_leaves=12,
    )
)
@settings(max_examples=60, deadline=None)
def test_wire_value_json_documents_round_trip_semantically(doc):
    """Parsed-JSON values (dict/list) serialize to text that json-parses
    back EQUAL — and the serialization is canonical (same value in any
    key order → same string)."""
    import json

    from binwatch_spark.sources.binlog import _wire_value

    if not isinstance(doc, (dict, list)):
        return
    s = _wire_value(doc)
    assert json.loads(s) == doc
    assert _wire_value(json.loads(s)) == s


@given(
    st.lists(
        st.tuples(
            st.integers(0, 3), st.integers(1, 9), st.integers(1, 100)
        ),
        min_size=0,
        max_size=25,
    ),
    st.tuples(st.integers(0, 4), st.integers(1, 9), st.integers(1, 110)),
)
@settings(max_examples=80, deadline=None)
def test_mariadb_gtid_set_matches_watermark_model(adds, probe):
    """MariaDbGtidSet vs a per-domain max-seq model: contains is
    seq <= watermark, encode/parse round-trips the watermarks."""
    from binwatch_spark.sources.binlog import MariaDbGtidSet

    gs = MariaDbGtidSet({})
    model: dict[int, int] = {}
    for d, s, n in adds:
        gs = gs.with_gtid(f"{d}-{s}-{n}")
        model[d] = max(model.get(d, 0), n)
    pd_, ps, pn = probe
    assert gs.contains(f"{pd_}-{ps}-{pn}") == (pn <= model.get(pd_, 0))
    reparsed = MariaDbGtidSet.parse(gs.encode())
    for d, hi in model.items():
        assert reparsed.contains(f"{d}-1-{hi}")
        assert not reparsed.contains(f"{d}-1-{hi + 1}")
