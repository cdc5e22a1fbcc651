"""Round-12 COMPLEX<json> comparison/ordering reproduction pins.

The reference orders COMPLEX<json> values through
StructuredData.compareTo (StructuredData.java:151-188): nulls first,
strings by value, numbers as doubles, and everything else by
Long.compare of XXH64(SMILE(value)) with the SEED int 0x9747b28c
sign-extended into the long-seed hash call. These tests pin the
pure-Python reproduction so encoder/hash regressions surface without
a quidem run (the corpus pins the order end-to-end in
sql_order_by.03 A24/A25 across all three engine-variant files).
"""
from druid_spark.functions.register import _smile_encode, _xxh64


def test_xxh64_published_vectors():
    # xxHash repo sanity suite: buffer[i] = (byte)(gen >> 24),
    # gen *= gen (U32), gen0 = 2654435761
    g, buf = 2654435761, bytearray()
    for _ in range(101):
        buf.append((g >> 24) & 0xFF)
        g = (g * g) & 0xFFFFFFFF
    prime = 2654435761
    assert _xxh64(b"", 0) == 0xEF46DB3751D8E999
    assert _xxh64(bytes(buf[:1]), 0) == 0x4FCE394CC88952D8
    assert _xxh64(bytes(buf[:1]), prime) == 0x739840CB819FA723
    assert _xxh64(bytes(buf[:14]), 0) == 0xCFFA8DB881BC3A3D
    assert _xxh64(bytes(buf[:14]), prime) == 0x5B9611585EFCC9CB
    assert _xxh64(bytes(buf[:101]), 0) == 0x0EAB543384F878AD
    assert _xxh64(bytes(buf[:101]), prime) == 0xCAA65939306F1E21


def test_smile_token_layer():
    # header 3A 29 0A 05 (version 0, shared names, raw binary)
    assert _smile_encode(None)[:4] == b":)\n\x05"
    assert _smile_encode(None)[4:] == b"\x21"
    assert _smile_encode(True)[4:] == b"\x23"
    assert _smile_encode(False)[4:] == b"\x22"
    # small ints: 0xC0 + zigzag
    assert _smile_encode(1)[4:] == b"\xc2"
    assert _smile_encode(-1)[4:] == b"\xc1"
    assert _smile_encode(0)[4:] == b"\xc0"
    # tiny ASCII: 0x40 + len-1
    assert _smile_encode("S1")[4:] == b"\x41S1"
    assert _smile_encode("")[4:] == b"\x20"
    # arrays / objects
    assert _smile_encode([])[4:] == b"\xf8\xf9"
    assert _smile_encode({})[4:] == b"\xfa\xfb"
    # sorted keys, short-ASCII name tokens 0x80+len-1
    assert _smile_encode({"b": 1, "a": 2})[4:] == \
        b"\xfa\x80a\xc4\x80b\xc2\xfb"
    # 64-bit double: 0x29 + 10 bytes, first byte = bit 63
    enc = _smile_encode(0.1)[4:]
    assert enc[0] == 0x29 and len(enc) == 11
    import struct
    bits = struct.unpack(">Q", struct.pack(">d", 0.1))[0]
    assert enc[1] == (bits >> 63) & 0x7F
    assert enc[10] == bits & 0x7F


def test_container_order_matches_goldens():
    """The two distinct $[7] group values of the qaArray test_array
    dataset sort [true,...] BEFORE [null,...] under the signed
    sign-extended-seed hash (sql_order_by.03 A24 ASC golden), while
    the $[7][7] values sort the OTHER way (A25) — the pair pins the
    hash orientation in both directions."""
    seed = 0xFFFFFFFF9747B28C

    def key(v):
        h = _xxh64(_smile_encode(v), seed)
        return h - (1 << 64) if h >= (1 << 63) else h

    base = [[True, False, None], [1, 2, None], [0.1, 0.2, None],
            ["S1", "S2", None], [None, None, None], [],
            [True, 1, 0.1, "S1", None]]
    flip = [[None, False, True], [None, 2, 1], [None, 0.2, 0.1],
            [None, "S2", "S1"], [None, None, None], [],
            [None, "S1", 0.1, 1, True]]
    a24_true = base + [base]     # $[7]: nested copy appended
    a24_null = flip + [flip]
    assert key(a24_true) < key(a24_null)   # A24 ASC: true-first
    assert key(base) > key(flip)           # A25 ASC: null-first


def test_smile_long_shared_name_refs():
    """Objects with >64 distinct keys use the 2-byte 0x30-0x33 long
    shared-name back-reference on repeat (r13, ADVICE), and a key's
    table index is assigned once — re-encoding must not renumber."""
    keys = [f"key{i:03d}" for i in range(100)]  # sorted lexicographic
    obj = {k: 1 for k in keys}
    enc = _smile_encode([obj, obj, obj])[4:]
    # second object: keys 0-63 short refs 0x40+i, 64-99 long refs
    # 0x30 + (idx>>8), idx&0xFF.  key064 has index 64 -> b"\x30\x40"
    assert b"\x30\x40" in enc
    assert enc.count(b"\x30\x40") == 2       # once per repeat object
    # short back-ref for index 0 appears exactly twice as a key slot:
    # objects 2 and 3 both reference key000 as 0x40
    first_obj_end = enc.index(b"\xfb")
    rest = enc[first_obj_end:]
    # literal spellings never reappear after the first object
    assert b"key064" not in rest and b"key000" not in rest
    # determinism: three identical objects -> objects 2 and 3 encode
    # byte-identically (no index drift on re-encode)
    bodies = enc[1:-1].split(b"\xfb")        # strip array F8/F9
    assert bodies[1] == bodies[2]
    # names longer than 64 encoded bytes are never shared: the second
    # occurrence still spells the name out
    longk = "k" * 70
    enc2 = _smile_encode([{longk: 1}, {longk: 1}])[4:]
    assert enc2.count(longk.encode()) == 2
