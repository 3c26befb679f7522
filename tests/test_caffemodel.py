"""Raw .caffemodel parser tests: fabricate wire-format bytes with an
independent encoder, parse with tools/parse_caffemodel, check the
kaffe-equivalent transforms (HWIO transpose, BatchNorm scale_factor
normalization, Scale-into-BN merge)."""

import numpy as np
import pytest

from tools.parse_caffemodel import (parse_blob, parse_caffemodel,
                                    to_kaffe_dict)


# --- minimal protobuf wire encoder (test-side, independent of the parser) --

def varint(x: int) -> bytes:
    out = b""
    while True:
        b7 = x & 0x7F
        x >>= 7
        if x:
            out += bytes([b7 | 0x80])
        else:
            return out + bytes([b7])


def tag(field: int, wt: int) -> bytes:
    return varint((field << 3) | wt)


def len_field(field: int, payload: bytes) -> bytes:
    return tag(field, 2) + varint(len(payload)) + payload


def encode_blob(arr: np.ndarray, legacy_dims=False) -> bytes:
    arr = np.asarray(arr, np.float32)
    out = b""
    if legacy_dims:
        dims4 = ([1] * (4 - arr.ndim)) + list(arr.shape)
        for i, d in enumerate(dims4, start=1):
            out += tag(i, 0) + varint(d)
    else:
        shape = b"".join(tag(1, 0) + varint(d) for d in arr.shape)
        out += len_field(7, shape)
    out += len_field(5, arr.reshape(-1).tobytes())
    return out


def encode_layer(name: str, ltype: str, blobs, v1=False) -> bytes:
    if v1:
        out = len_field(4, name.encode())
        enum = {"Convolution": 4, "InnerProduct": 14}[ltype]
        out += tag(5, 0) + varint(enum)
        for b in blobs:
            out += len_field(6, encode_blob(b, legacy_dims=True))
    else:
        out = len_field(1, name.encode()) + len_field(2, ltype.encode())
        for b in blobs:
            out += len_field(7, encode_blob(b))
    return out


def encode_net(layers, v1=False) -> bytes:
    field = 2 if v1 else 100
    return b"".join(len_field(field, encode_layer(*l, v1=v1))
                    for l in layers)


class TestWireParsing:
    def test_blob_roundtrip_shape_and_data(self):
        rng = np.random.default_rng(0)
        arr = rng.standard_normal((2, 3, 4, 5)).astype(np.float32)
        got = parse_blob(memoryview(encode_blob(arr)))
        np.testing.assert_array_equal(got, arr)

    def test_blob_legacy_dims(self):
        arr = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
        got = parse_blob(memoryview(encode_blob(arr, legacy_dims=True)))
        assert got.shape == (1, 2, 3, 4)
        np.testing.assert_array_equal(got.reshape(2, 3, 4), arr)

    def test_net_new_and_v1_styles(self, tmp_path):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((8, 3, 1, 1)).astype(np.float32)
        for v1 in (False, True):
            path = str(tmp_path / f"net_{v1}.caffemodel")
            with open(path, "wb") as f:
                f.write(encode_net([("conv1", "Convolution",
                                     [w, np.zeros(8, np.float32)])], v1=v1))
            layers = parse_caffemodel(path)
            assert len(layers) == 1
            name, ltype, blobs = layers[0]
            assert name == "conv1" and ltype == "Convolution"
            assert len(blobs) == 2


class TestKaffeTransforms:
    def test_conv_hwio_and_bn_scale_merge(self, tmp_path):
        rng = np.random.default_rng(2)
        w = rng.standard_normal((16, 8, 3, 3)).astype(np.float32)  # OIHW
        b = rng.standard_normal((16,)).astype(np.float32)
        mean = rng.standard_normal((16,)).astype(np.float32)
        var = np.abs(rng.standard_normal((16,))).astype(np.float32) + 0.5
        sf = np.asarray([4.0], np.float32)      # caffe scale_factor
        gamma = rng.standard_normal((16,)).astype(np.float32)
        beta = rng.standard_normal((16,)).astype(np.float32)
        net = encode_net([
            ("res2a_branch1", "Convolution", [w, b]),
            ("bn2a_branch1", "BatchNorm", [mean, var, sf]),
            ("scale2a_branch1", "Scale", [gamma, beta]),
        ])
        path = str(tmp_path / "m.caffemodel")
        with open(path, "wb") as f:
            f.write(net)

        d = to_kaffe_dict(parse_caffemodel(path))
        # conv: OIHW -> HWIO
        np.testing.assert_array_equal(d["res2a_branch1"]["weights"],
                                      w.transpose(2, 3, 1, 0))
        np.testing.assert_array_equal(d["res2a_branch1"]["biases"], b)
        # BN statistics normalized by scale_factor
        np.testing.assert_allclose(d["bn2a_branch1"]["moving_mean"],
                                   mean / 4.0, rtol=1e-6)
        np.testing.assert_allclose(d["bn2a_branch1"]["moving_variance"],
                                   var / 4.0, rtol=1e-6)
        # Scale merged into the bn scope by name
        np.testing.assert_array_equal(d["bn2a_branch1"]["gamma"], gamma)
        np.testing.assert_array_equal(d["bn2a_branch1"]["beta"], beta)

    def test_scale_adjacency_fallback_and_identity_affine(self, tmp_path):
        mean = np.zeros((4,), np.float32)
        var = np.ones((4,), np.float32)
        sf = np.asarray([1.0], np.float32)
        g = np.full((4,), 2.0, np.float32)
        net = encode_net([
            ("norm_a", "BatchNorm", [mean, var, sf]),
            ("oddname", "Scale", [g]),              # adjacency merge
            ("norm_b", "BatchNorm", [mean, var, sf]),  # no Scale at all
        ])
        path = str(tmp_path / "m2.caffemodel")
        with open(path, "wb") as f:
            f.write(net)
        d = to_kaffe_dict(parse_caffemodel(path))
        np.testing.assert_array_equal(d["norm_a"]["gamma"], g)
        np.testing.assert_array_equal(d["norm_a"]["beta"],
                                      np.zeros(4, np.float32))
        # identity affine when the caffemodel carries no Scale layer
        np.testing.assert_array_equal(d["norm_b"]["gamma"],
                                      np.ones(4, np.float32))

    def test_feeds_backbone_converter(self, tmp_path):
        """The parsed dict plugs into convert_backbone_from_kaffe_npy for a
        one-unit backbone subset (conv1 + its BN), proving format parity
        with the kaffe-npy intermediate the converter already ingests."""
        import jax
        from cmpc_refseg_tpu.models.backbone import init_backbone
        from tools.convert_tf_checkpoint import (BN_EPS,
                                                 convert_backbone_from_kaffe_npy)
        rng = np.random.default_rng(3)
        params_bb = init_backbone(jax.random.PRNGKey(0), 2)

        layers = []
        def add_unit(conv_name, w_shape):
            bn = "bn_conv1" if conv_name == "conv1" else "bn" + conv_name[3:]
            sc = "scale_conv1" if conv_name == "conv1" \
                else "scale" + conv_name[3:]
            cout = w_shape[-1]
            w_oihw = rng.standard_normal(
                (cout, w_shape[2], w_shape[0], w_shape[1])
            ).astype(np.float32)
            layers.append((conv_name, "Convolution", [w_oihw]))
            layers.append((bn, "BatchNorm",
                           [rng.standard_normal(cout).astype(np.float32),
                            (np.abs(rng.standard_normal(cout)) + 0.5
                             ).astype(np.float32),
                            np.asarray([2.0], np.float32)]))
            layers.append((sc, "Scale",
                           [rng.standard_normal(cout).astype(np.float32),
                            rng.standard_normal(cout).astype(np.float32)]))

        add_unit("conv1", params_bb["conv1"]["w"].shape)
        for bname, bp in params_bb.items():
            if bname == "conv1":
                continue
            for branch, unit in bp.items():
                add_unit(f"{bname}_{branch}", unit["w"].shape)

        path = str(tmp_path / "bb.caffemodel")
        with open(path, "wb") as f:
            f.write(encode_net(layers))
        from tools.parse_caffemodel import main as parse_main
        npy = str(tmp_path / "bb.npy")
        parse_main(["--model", path, "--out", npy])

        filled = convert_backbone_from_kaffe_npy(npy, params_bb)
        u = filled["res2a"]["branch2a"]
        assert np.isfinite(np.asarray(u["w"])).all()
        assert np.isfinite(np.asarray(u["scale"])).all()
        assert u["w"].shape == params_bb["res2a"]["branch2a"]["w"].shape
