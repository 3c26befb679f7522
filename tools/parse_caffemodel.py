"""Raw .caffemodel -> kaffe-style .npy weight dict, without protobuf codegen.

Closes the reference's caffe weight-conversion bridge
(external/tensorflow-deeplab-resnet/kaffe/caffe/{caffepb,resolver}.py — a
5.5k-line GENERATED protobuf module): this is a from-scratch protobuf
wire-format reader for the three messages the conversion needs
(NetParameter -> LayerParameter/V1LayerParameter -> BlobProto), plus the
kaffe-equivalent transforms (conv kernels [O,I,H,W] -> HWIO, Caffe
BatchNorm mean/var/scale_factor + Scale gamma/beta fused per BN scope —
kaffe/transformers.py:209-289 semantics).

The output dict {op_name: {param_name: array}} is exactly what
tools/convert_tf_checkpoint.convert_backbone_from_kaffe_npy and
tools/pretrain_backbone.py ingest, so raw MSRA/DeepLab caffemodels convert
end-to-end:

  python tools/parse_caffemodel.py --model deeplab_resnet.caffemodel \
      --out deeplab_resnet.npy
"""

from __future__ import annotations

import argparse
import struct

import numpy as np

# wire types
_VARINT, _I64, _LEN, _I32 = 0, 1, 2, 5


def read_varint(buf: memoryview, pos: int):
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def iter_fields(buf: memoryview):
    """Yield (field_number, wire_type, value) over one message's bytes.
    LEN fields yield memoryviews; VARINT ints; I32/I64 raw 4/8 bytes."""
    pos = 0
    n = len(buf)
    while pos < n:
        key, pos = read_varint(buf, pos)
        field, wt = key >> 3, key & 0x7
        if wt == _VARINT:
            val, pos = read_varint(buf, pos)
        elif wt == _LEN:
            ln, pos = read_varint(buf, pos)
            val = buf[pos:pos + ln]
            pos += ln
        elif wt == _I32:
            val = buf[pos:pos + 4]
            pos += 4
        elif wt == _I64:
            val = buf[pos:pos + 8]
            pos += 8
        else:
            raise ValueError(f"unsupported wire type {wt} at {pos}")
        yield field, wt, val


def _floats(val, wt):
    """Repeated float field: packed (LEN of 4-byte floats) or single I32."""
    if wt == _LEN:
        return np.frombuffer(bytes(val), dtype="<f4")
    return np.frombuffer(bytes(val), dtype="<f4")  # single I32 entry


def parse_blob(buf: memoryview) -> np.ndarray:
    """BlobProto: 1..4 num/channels/height/width, 5 data (packed float),
    7 shape (BlobShape: repeated int64 dim), 8 double_data."""
    legacy = {}
    dims = None
    chunks = []
    for field, wt, val in iter_fields(buf):
        if field in (1, 2, 3, 4) and wt == _VARINT:
            legacy[field] = val
        elif field == 5:
            chunks.append(_floats(val, wt))
        elif field == 7 and wt == _LEN:
            dims = []
            for f2, wt2, v2 in iter_fields(val):
                if f2 == 1:
                    if wt2 == _VARINT:
                        dims.append(v2)
                    else:  # packed varints
                        p = 0
                        while p < len(v2):
                            d, p = read_varint(v2, p)
                            dims.append(d)
        elif field == 8 and wt == _LEN:   # double_data
            chunks.append(np.frombuffer(bytes(val), dtype="<f8"
                                        ).astype(np.float32))
    data = (np.concatenate(chunks) if chunks
            else np.zeros((0,), np.float32))
    if dims is None and legacy:
        dims = [legacy.get(i, 1) for i in (1, 2, 3, 4)]
    if dims:
        data = data.reshape(dims)
    return data


# V1LayerParameter type enum values we care about
_V1_TYPES = {4: "Convolution", 14: "InnerProduct", 17: "Scale"}


def parse_layer(buf: memoryview, v1: bool):
    """LayerParameter (name=1, type=2 str, blobs=7) or V1LayerParameter
    (name=4, type=5 enum, blobs=6) -> (name, type, [blobs])."""
    name_f, type_f, blobs_f = (4, 5, 6) if v1 else (1, 2, 7)
    name = ""
    ltype = ""
    blobs = []
    for field, wt, val in iter_fields(buf):
        if field == name_f and wt == _LEN:
            name = bytes(val).decode("utf-8", "replace")
        elif field == type_f:
            if wt == _LEN:
                ltype = bytes(val).decode("utf-8", "replace")
            else:
                ltype = _V1_TYPES.get(val, str(val))
        elif field == blobs_f and wt == _LEN:
            blobs.append(parse_blob(val))
    return name, ltype, blobs


def parse_caffemodel(path: str):
    """-> list of (name, type, [np blobs]) in file order (NetParameter:
    layer=100 new-style, layers=2 V1 legacy)."""
    with open(path, "rb") as f:
        buf = memoryview(f.read())
    layers = []
    for field, wt, val in iter_fields(buf):
        if field == 100 and wt == _LEN:
            layers.append(parse_layer(val, v1=False))
        elif field == 2 and wt == _LEN:
            layers.append(parse_layer(val, v1=True))
    return layers


def to_kaffe_dict(layers, bn_eps_fuse: bool = True) -> dict:
    """kaffe-equivalent transform (kaffe/transformers.py:209-289):

    - Convolution/InnerProduct: blob0 [O,I,H,W] -> 'weights' HWIO
      (+ 'biases' when blob1 present);
    - BatchNorm: blobs (mean, variance, scale_factor) ->
      moving_mean = mean/sf, moving_variance = var/sf;
    - Scale: (gamma, beta) merged into the matching BN scope ('scaleX' ->
      'bnX'; otherwise the immediately preceding BatchNorm layer — the
      graph-adjacency rule kaffe uses)."""
    out = {}
    last_bn = None
    for name, ltype, blobs in layers:
        if not blobs:
            continue
        if ltype in ("Convolution", "InnerProduct", "Deconvolution"):
            d = {}
            w = blobs[0]
            if w.ndim == 4:
                w = w.transpose(2, 3, 1, 0)           # OIHW -> HWIO
            d["weights"] = np.ascontiguousarray(w, np.float32)
            if len(blobs) > 1:
                d["biases"] = np.asarray(blobs[1], np.float32).reshape(-1)
            out[name] = d
        elif ltype == "BatchNorm" or (len(blobs) == 3
                                      and blobs[2].size == 1):
            mean, var, sf = (np.asarray(b, np.float32).reshape(-1)
                             for b in blobs[:3])
            scale = 1.0 / sf[0] if sf.size and sf[0] != 0 else 1.0
            out[name] = {"moving_mean": mean * scale,
                         "moving_variance": var * scale}
            last_bn = name
        elif ltype == "Scale" and len(blobs) >= 1:
            target = None
            if name.startswith("scale"):
                cand = "bn" + name[len("scale"):]
                if cand in out:
                    target = cand
            if target is None:
                target = last_bn
            if target is None:
                continue
            out[target]["gamma"] = np.asarray(blobs[0], np.float32
                                              ).reshape(-1)
            if len(blobs) > 1:
                out[target]["beta"] = np.asarray(blobs[1], np.float32
                                                 ).reshape(-1)
    # BN scopes without a (full) Scale layer get identity affine terms
    # (kaffe default)
    for name, d in out.items():
        if "moving_mean" in d:
            c = d["moving_mean"].shape[0]
            d.setdefault("gamma", np.ones((c,), np.float32))
            d.setdefault("beta", np.zeros((c,), np.float32))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(__doc__)
    ap.add_argument("--model", required=True, help=".caffemodel file")
    ap.add_argument("--out", required=True, help="output .npy dict")
    args = ap.parse_args(argv)
    layers = parse_caffemodel(args.model)
    print(f"{len(layers)} layers; "
          f"{sum(1 for _, _, b in layers if b)} with weights")
    data = to_kaffe_dict(layers)
    np.save(args.out, data, allow_pickle=True)
    print(f"wrote {args.out} ({len(data)} ops)")


if __name__ == "__main__":
    main()
