"""utils/xplane wire-format reader against a hand-encoded XSpace proto."""

from bert4clickpath_tpu.utils.xplane import plane_kernel_totals


def _varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _field(fnum: int, wt: int, payload) -> bytes:
    tag = _varint((fnum << 3) | wt)
    if wt == 0:
        return tag + _varint(payload)
    return tag + _varint(len(payload)) + payload


def _event(meta_id: int, dur_ps: int) -> bytes:
    return _field(1, 0, meta_id) + _field(3, 0, dur_ps)


def _meta_entry(meta_id: int, name: bytes) -> bytes:
    meta = _field(1, 0, meta_id) + _field(2, 2, name)
    return _field(1, 0, meta_id) + _field(2, 2, meta)


def _line(events, name: bytes = b"") -> bytes:
    body = _field(2, 2, name) if name else b""
    return body + b"".join(_field(4, 2, _event(m, d)) for m, d in events)


def _plane(name: bytes, metas, events, extra_lines=()) -> bytes:
    body = _field(2, 2, name)
    body += _field(3, 2, _line(events))
    for ln in extra_lines:
        body += _field(3, 2, ln)
    for mid, mname in metas:
        body += _field(4, 2, _meta_entry(mid, mname))
    return _field(1, 2, body)


def test_plane_kernel_totals_sums_durations():
    space = _plane(
        b"/device:TPU:0",
        [(7, b"fusion.1"), (9, b"custom-call.3")],
        [(7, 1000), (7, 500), (9, 2000)],
    ) + _plane(
        # host plane must be excluded by the filter
        b"/host:CPU",
        [(1, b"python")],
        [(1, 99999)],
    )
    totals = plane_kernel_totals(space, plane_filter="TPU")
    assert totals == {"fusion.1": 1500, "custom-call.3": 2000}


def test_unknown_metadata_id_falls_back_to_str():
    space = _plane(b"TPU plane", [], [(42, 777)])
    assert plane_kernel_totals(space) == {"42": 777}


def test_overlapping_lines_not_double_counted():
    # Real TPU planes carry 'Steps' / 'XLA Modules' / 'Async XLA Ops' lines
    # that re-describe the same device time; only 'XLA Ops' must count.
    space = _plane(
        b"/device:TPU:0",
        [(1, b"step0"), (2, b"module.7"), (3, b"fusion.1"), (4, b"copy-start.2")],
        [],
        extra_lines=[
            _line([(1, 500_000)], name=b"Steps"),
            _line([(2, 500_000)], name=b"XLA Modules"),
            _line([(3, 400_000)], name=b"XLA Ops"),
            _line([(4, 900_000)], name=b"Async XLA Ops"),
        ],
    )
    assert plane_kernel_totals(space) == {"fusion.1": 400_000}
