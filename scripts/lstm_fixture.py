#!/usr/bin/env python3
"""Dev-only generator for the KerasLstm cross-implementation fixture.

Implements the reference architecture (bdb2026/models.py:24-67:
Masking(0.0) -> LSTM(64, seq) -> LSTM(32, seq) -> TD Dense(16, relu) ->
TD Dense(1)) INDEPENDENTLY in NumPy float32, reading the committed weights
through its own minimal HDF5 parser (struct-level, no h5py), and runs it on
deterministic pseudo-random sequences. The resulting
src/test/resources/lstm_fixture.csv pins the Scala forward pass
(graft.ml.KerasLstm) to the published Keras LSTM equations via a second,
unrelated implementation: a bug in either gate math, gate order, masking, or
weight slicing shows up as a mismatch.

Usage: python3 scripts/lstm_fixture.py <model.h5> <out.csv>
"""
import struct, sys
import numpy as np

# ---- minimal HDF5 (superblock v0, symbol-table groups, contiguous floats)

def read_tensors(path):
    data = open(path, "rb").read()
    u8 = lambda o: data[o]
    u16 = lambda o: struct.unpack_from("<H", data, o)[0]
    u32 = lambda o: struct.unpack_from("<I", data, o)[0]
    u64 = lambda o: struct.unpack_from("<Q", data, o)[0]
    assert data[:8] == b"\x89HDF\r\n\x1a\n" and u8(8) == 0

    def ste(o):
        return dict(name=u64(o), ohdr=u64(o + 8), btree=u64(o + 24),
                    heap=u64(o + 32))

    def heap_name(heap, off):
        d = u64(heap + 24) + off
        e = data.index(b"\x00", d)
        return data[d:e].decode()

    def messages(ohdr):
        nmsg, out, blocks = u16(ohdr + 2), [], [(ohdr + 16, u32(ohdr + 8))]
        n = 0
        while blocks and n < nmsg:
            o, ln = blocks.pop(0)
            end = o + ln
            while o + 8 <= end and n < nmsg:
                t, sz = u16(o), u16(o + 2)
                if t == 0x10:
                    blocks.append((u64(o + 8), u64(o + 16)))
                else:
                    out.append((t, o + 8, sz))
                n += 1
                o += 8 + sz
        return out

    def children(btree, heap):
        out = []
        def walk(a):
            level, nent = u8(a + 5), u16(a + 6)
            o = a + 32
            for _ in range(nent):
                c = u64(o); o += 16
                if level:
                    walk(c)
                else:
                    for i in range(u16(c + 6)):
                        s = ste(c + 8 + 40 * i)
                        out.append((heap_name(heap, s["name"]), s))
        walk(btree)
        return out

    tensors = {}
    def walk(path, s):
        msgs = messages(s["ohdr"])
        st = [b for t, b, _ in msgs if t == 0x11]
        if st:
            for nm, c in children(u64(st[0]), u64(st[0] + 8)):
                walk(path + "/" + nm, c)
            return
        dims = dtype = addr = None
        for t, b, _ in msgs:
            if t == 1:
                v, rank = u8(b), u8(b + 1)
                base = b + (8 if v == 1 else 4)
                dims = [u64(base + 8 * i) for i in range(rank)]
            elif t == 3 and (u8(b) & 0xF) == 1:
                dtype = u32(b + 4)
            elif t == 8 and u8(b) == 3 and u8(b + 1) == 1:
                addr = u64(b + 2)
        if dims is not None and dtype in (4, 8) and addr is not None:
            n = int(np.prod(dims)) if dims else 1
            dt = "<f4" if dtype == 4 else "<f8"
            tensors[path] = np.frombuffer(
                data, dtype=dt, count=n, offset=addr
            ).astype(np.float32).reshape(dims)

    root = ste(56)
    for nm, s in children(root["btree"], root["heap"]):
        walk("/" + nm, s)
    return tensors


def pick(tensors, layer, leaf):
    for p, t in tensors.items():
        if p.startswith(f"/model_weights/{layer}/") and p.endswith("/" + leaf):
            return t
    raise KeyError((layer, leaf))


def lstm_layer(x_seq, mask, W, R, b):
    """x_seq (T, nIn) float32 -> (T, U). Keras gate order [i, f, g, o].
    `mask` comes from the Masking layer on the ORIGINAL input and propagates
    through every downstream layer (Keras mask semantics): a masked timestep
    is skipped by both LSTMs, regardless of this layer's input values."""
    U = R.shape[0]
    h = np.zeros(U, np.float32)
    c = np.zeros(U, np.float32)
    out = np.zeros((len(x_seq), U), np.float32)
    sig = lambda v: (1.0 / (1.0 + np.exp(-v.astype(np.float64)))).astype(np.float32)
    for t, x in enumerate(x_seq):
        if not mask[t]:  # Masking(0.0): skip, carry state
            out[t] = h
            continue
        z = x @ W + h @ R + b
        i, f, g, o = z[:U], z[U:2*U], z[2*U:3*U], z[3*U:]
        c = sig(f) * c + sig(i) * np.tanh(g)
        h = sig(o) * np.tanh(c)
        out[t] = h
    return out


def forward(tensors, x_seq):
    mask = np.any(x_seq != 0.0, axis=1)
    h1 = lstm_layer(x_seq, mask, pick(tensors, "lstm_1", "kernel"),
                    pick(tensors, "lstm_1", "recurrent_kernel"),
                    pick(tensors, "lstm_1", "bias"))
    h2 = lstm_layer(h1, mask, pick(tensors, "lstm_2", "kernel"),
                    pick(tensors, "lstm_2", "recurrent_kernel"),
                    pick(tensors, "lstm_2", "bias"))
    d = np.maximum(h2 @ pick(tensors, "dense_1", "kernel")
                   + pick(tensors, "dense_1", "bias"), 0)
    y = d @ pick(tensors, "output", "kernel") + pick(tensors, "output", "bias")
    return y[:, 0]


def main():
    model_path, out_path = sys.argv[1], sys.argv[2]
    tensors = read_tensors(model_path)
    n_feat = pick(tensors, "lstm_1", "kernel").shape[0]
    rng = np.random.RandomState(42)
    rows = []
    for seq_id, T in enumerate([25, 7, 1, 12, 6]):
        # feature-scaled inputs: positions tens, trig features unit-scale —
        # roughly the notebook's feature magnitudes (cell 64 sample)
        scales = np.ones(n_feat, np.float32)
        scales[:2] = 50.0; scales[5] = 15.0; scales[9] = 2.0
        x = (rng.randn(T, n_feat).astype(np.float32) * scales).astype(np.float32)
        if seq_id == 3:   # interior all-zero row: Masking must skip it
            x[5, :] = 0.0
        if seq_id == 4:   # LEADING all-zero row: output is the zero-state
            x[0, :] = 0.0 # bias path, not 0.0 (mask carries initial state)
        y = forward(tensors, x)
        for t in range(T):
            rows.append((seq_id, t,
                         ";".join(repr(float(v)) for v in x[t]),
                         repr(float(y[t]))))
    with open(out_path, "w") as f:
        f.write("seq_id,t,x,y\n")
        for r in rows:
            f.write("%d,%d,%s,%s\n" % r)
    print(f"wrote {len(rows)} rows, n_features={n_feat}")


if __name__ == "__main__":
    main()
