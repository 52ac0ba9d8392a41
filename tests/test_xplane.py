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


def _plane(name: bytes, metas, events) -> bytes:
    body = _field(2, 2, name)
    line = b"".join(_field(4, 2, _event(m, d)) for m, d in events)
    body += _field(3, 2, line)
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
