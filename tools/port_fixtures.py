#!/usr/bin/env python3
"""One-time, stdlib-only port of anonlink-entity-service test fixtures
(pickles) to portable binary files consumed by the Scala tests.

Inputs (read-only): /root/reference/backend/entityservice/tests/testdata/
Outputs: /root/repo/fixtures/
"""
import pickle, sys, types, csv, os

TD = "/root/reference/backend/entityservice/tests/testdata"
OUT = "/root/repo/fixtures"

# --- stub bitarray so the pickle loads without the real package ---
class FakeBitarray:
    def __init__(self, *a, **kw):
        self.raw = b""
        if a and isinstance(a[0], (bytes, bytearray)):
            self.raw = bytes(a[0])
    def __setstate__(self, state):
        # bitarray pickles as tuple(nbits? buffer ...) depending on version
        if isinstance(state, (bytes, bytearray)):
            self.raw = bytes(state)
        elif isinstance(state, tuple):
            for item in state:
                if isinstance(item, (bytes, bytearray)):
                    self.raw = bytes(item)
    def frombytes(self, b):
        self.raw += bytes(b)

def _reconstructor(*args):
    fb = FakeBitarray()
    for a in args:
        if isinstance(a, (bytes, bytearray)):
            fb.raw = bytes(a)
    return fb

mod = types.ModuleType("bitarray")
mod.bitarray = FakeBitarray
mod._bitarray_reconstructor = _reconstructor
sys.modules["bitarray"] = mod
mod2 = types.ModuleType("bitarray._bitarray")
mod2.bitarray = FakeBitarray
sys.modules["bitarray._bitarray"] = mod2

class StubUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module.startswith("bitarray"):
            if name in ("bitarray", "_bitarray"):
                return FakeBitarray
            return _reconstructor
        return super().find_class(module, name)

os.makedirs(OUT, exist_ok=True)

with open(f"{TD}/febrl4_clks_and_truth.pkl", "rb") as f:
    obj = StubUnpickler(f).load()
filters_a, filters_b, ids_a, ids_b, clks_a, clks_b = obj
print("febrl4 sizes:", len(filters_a), len(filters_b), len(ids_a), len(ids_b))

import base64
def clk_bytes(fil, b64):
    # bitarray's pickle buffer = 1 padbits byte + raw bytes; the b64 "upload
    # form" carries the identical 128 raw bytes — cross-check the two.
    raw = base64.b64decode(b64)
    if getattr(fil, "raw", b""):
        assert fil.raw[1:] == raw, "bitarray buffer != b64 clk"
    return raw

raws_a = [clk_bytes(f, c) for f, c in zip(filters_a, clks_a)]
raws_b = [clk_bytes(f, c) for f, c in zip(filters_b, clks_b)]
sizes = {len(r) for r in raws_a + raws_b}
print("clk sizes:", sizes)
assert sizes == {128}, sizes

with open(f"{OUT}/febrl4_a.bin", "wb") as f:
    for r in raws_a: f.write(r)
with open(f"{OUT}/febrl4_b.bin", "wb") as f:
    for r in raws_b: f.write(r)
with open(f"{OUT}/febrl4_truth.csv", "w", newline="") as f:
    w = csv.writer(f)
    w.writerow(["row_a", "row_b"])
    idx_b = {}
    for j, e in enumerate(ids_b): idx_b.setdefault(e, []).append(j)
    n = 0
    for i, e in enumerate(ids_a):
        for j in idx_b.get(e, []):
            w.writerow([i, j]); n += 1
    print("true pairs:", n)

with open(f"{TD}/test-multiparty-results-correctness-data.pkl", "rb") as f:
    mp = StubUnpickler(f).load()
print("multiparty datasets:", len(mp), [len(d) for d in mp])
for k, ds in enumerate(mp):
    with open(f"{OUT}/multiparty_{k}.bin", "wb") as f:
        for rec in ds:
            assert isinstance(rec, (bytes, bytearray)) and len(rec) == 128, (type(rec), len(rec))
            f.write(rec)
print("OK")
