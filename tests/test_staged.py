"""Staged extraction must match the monolithic pipeline exactly."""

import numpy as np

from popsift_tpu.config import Config
from popsift_tpu.extract import get_extractor, normalize_input
from popsift_tpu.features import assemble_features
from popsift_tpu.staged import StagedExtractor, bucket


def test_bucket():
    assert bucket(0) == 0
    assert bucket(1) == 128
    assert bucket(128) == 128
    assert bucket(129) == 160   # quarter-power steps
    assert bucket(2303) == 2560
    assert bucket(5000) == 5120
    # monotone and covering
    prev = 0
    for n in range(1, 3000, 7):
        b = bucket(n)
        assert b >= n
        assert b >= prev or n <= prev
        prev = b


def test_staged_matches_monolithic(blob_image):
    h, w = blob_image.shape
    cfg = Config()
    norm = normalize_input(blob_image)

    mono_fn, _ = get_extractor(cfg, w, h)
    mono = assemble_features(mono_fn(norm), cfg.get_upscale_factor())

    staged = StagedExtractor(cfg, w, h)
    st = assemble_features(staged.extract(norm), cfg.get_upscale_factor())

    assert st.get_feature_count() == mono.get_feature_count()
    assert st.get_descriptor_count() == mono.get_descriptor_count()

    a = sorted((f.xpos, f.ypos, f.sigma, f.num_ori) for f in mono)
    b = sorted((f.xpos, f.ypos, f.sigma, f.num_ori) for f in st)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    da = np.sort(mono.get_descriptors(), axis=0)
    db = np.sort(st.get_descriptors(), axis=0)
    np.testing.assert_allclose(da, db, rtol=1e-4, atol=1e-5)


def test_packed_fast_path_matches_exact(blob_image):
    """extract_features' packed fused path (device-side finalize +
    u16 transfer) must reproduce the exact path's FeaturesHost."""
    h, w = blob_image.shape
    cfg = Config()
    norm = normalize_input(blob_image)

    staged = StagedExtractor(cfg, w, h)
    exact = staged.extract_features(norm)    # first call: establishment
    assert staged._last_key5 is not None
    packed = staged.extract_features(norm)   # second call: packed path
    # every hot path rides the (padded) batch program now; the single
    # program compiles only for legacy callers
    assert staged._fused_packed_batch or staged._fused_packed, \
        "packed fused program was not used"

    assert packed.get_feature_count() == exact.get_feature_count()
    assert packed.get_descriptor_count() == exact.get_descriptor_count()

    sa = exact._soa
    sb = packed._soa
    order_a = np.lexsort((sa["ypos"], sa["xpos"]))
    order_b = np.lexsort((sb["ypos"], sb["xpos"]))
    for k in ("xpos", "ypos", "sigma"):
        np.testing.assert_allclose(
            np.asarray(sa[k])[order_a], np.asarray(sb[k])[order_b],
            rtol=1e-6, atol=1e-6, err_msg=k)
    np.testing.assert_array_equal(np.asarray(sa["num_ori"])[order_a],
                                  np.asarray(sb["num_ori"])[order_b])
    np.testing.assert_array_equal(np.asarray(sa["debug_octave"])[order_a],
                                  np.asarray(sb["debug_octave"])[order_b])
    np.testing.assert_allclose(
        np.asarray(sa["orientation"])[order_a],
        np.asarray(sb["orientation"])[order_b], rtol=1e-6, atol=1e-6)

    # descriptors: compare per-feature through desc_idx (row order of the
    # descriptor matrix may differ between layouts)
    for ia, ib in zip(order_a, order_b):
        for k in range(int(sa["num_ori"][ia])):
            da = exact.get_descriptors()[int(sa["desc_idx"][ia][k])]
            db = packed.get_descriptors()[int(sb["desc_idx"][ib][k])]
            np.testing.assert_allclose(da, db, rtol=1e-4, atol=2e-5)


def test_packed_dev_path(blob_image):
    h, w = blob_image.shape
    cfg = Config()
    norm = normalize_input(blob_image)
    staged = StagedExtractor(cfg, w, h)
    dev0 = staged.extract_features(norm, want_dev=True)   # exact path
    dev1 = staged.extract_features(norm, want_dev=True)   # packed path
    assert dev1.get_feature_count() == dev0.get_feature_count()
    assert dev1.get_descriptor_count() == dev0.get_descriptor_count()
    d0 = np.sort(np.asarray(dev0.get_descriptors()), axis=0)
    d1 = np.sort(np.asarray(dev1.get_descriptors()), axis=0)
    np.testing.assert_allclose(d0, d1, rtol=1e-4, atol=2e-5)
    assert dev1.get_reverse_map().shape[0] == dev1.get_descriptor_count()


def test_staged_reuses_compiled_buckets(blob_image):
    h, w = blob_image.shape
    staged = StagedExtractor(Config(), w, h)
    norm = normalize_input(blob_image)
    staged.extract(norm)
    n2 = len(staged._stage2)
    n3 = len(staged._stage3)
    staged.extract(norm)
    assert len(staged._stage2) == n2
    assert len(staged._stage3) == n3


def test_desc_transfer_precisions(blob_image):
    """u16/u8 fixed-point descriptor transfer stays within its bound of
    the f32 values (u8 = the precision of the reference's own uchar
    output, features.cu:319-323)."""
    norm = (blob_image.astype(np.float32) / 255.0)
    descs = {}
    for mode in ("f32", "u16", "u8", "u8p"):
        cfg = Config()
        cfg.desc_transfer = mode
        ex = StagedExtractor(cfg, norm.shape[1], norm.shape[0])
        f = ex.extract_features(norm)      # exact path
        f2 = ex.extract_features(norm)     # packed path
        np.testing.assert_allclose(f.get_descriptors(), f2.get_descriptors(),
                                   atol=2.0 / 255.0)
        descs[mode] = np.asarray(f.get_descriptors())
    np.testing.assert_allclose(descs["u16"], descs["f32"],
                               atol=1.01 / 65535.0)
    np.testing.assert_allclose(descs["u8"], descs["f32"],
                               atol=1.01 / 255.0)
    # u8p is bit-lossless vs u8 (zero-compaction is an encoding, not a
    # quantisation)
    np.testing.assert_array_equal(descs["u8p"], descs["u8"])


def test_wire_prefix_words():
    """Count-adaptive prefix math: quantised, covers the estimate, never
    exceeds the full buffer, and degrades to full fetch without history
    or when the estimate reaches the bucket."""
    cfg = Config()
    st = StagedExtractor(cfg, 128, 96)
    O = st.plan.octaves
    key = ((128,) * O, (128,) * O, (128,) * O, 256, 2560)
    lay = st._flat_layout(key)
    assert st.wire_prefix_words(key) is None  # no history yet
    st._note_ori_total(100)
    n = st.wire_prefix_words(key)
    a, b = lay["desc"]
    wpr = (b - a) // lay["_BT"]
    # with bt=2560 and a recent total of 100 a prefix is expected
    assert n is not None
    assert n >= a + (int(100 * 1.125) + 8) * wpr
    assert n % st.WIRE_GRAN == 0
    assert n < lay["_total"]
    st._note_ori_total(2560)  # estimate >= bucket
    assert st.wire_prefix_words(key) is None


def test_decode_flat_truncated():
    """_decode_flat on a prefix: every header section decodes as from the
    full buffer; the desc section yields exactly the rows that arrived."""
    cfg = Config()
    st = StagedExtractor(cfg, 128, 96)
    O = st.plan.octaves
    key = ((128,) * O, (128,) * O, (128,) * O, 128, 128)
    lay = st._flat_layout(key)
    rng = np.random.default_rng(0)
    flat = rng.integers(0, 2 ** 32, size=lay["_total"],
                        dtype=np.uint64).astype(np.uint32)
    full = st._decode_flat(flat, key)
    a, b = lay["desc"]
    wpr = (b - a) // lay["_BT"]
    part = st._decode_flat(flat[:a + 7 * wpr], key)
    assert part["desc"].shape == (7, 128)
    np.testing.assert_array_equal(part["desc"], full["desc"][:7])
    np.testing.assert_array_equal(part["ori_d"], full["ori_d"])
    np.testing.assert_array_equal(part["num_ori"], full["num_ori"])
    np.testing.assert_array_equal(part["x"], full["x"])


def test_wire_prefix_refetch(textured_image):
    """A frame whose counts exceed the prefix estimate is refetched in
    full and still decodes identically to the exact path."""
    h, w = textured_image.shape
    cfg = Config()
    norm = normalize_input(textured_image)
    st = StagedExtractor(cfg, w, h)
    exact = st.extract_features(norm)
    assert exact.get_descriptor_count() > 8
    # sabotage the estimate so the packed path's prefix under-fetches
    st._recent_ori_totals.clear()
    st._recent_ori_totals.append(0)
    st.WIRE_GRAN = 8
    packed = st.extract_features(norm)
    assert packed.get_feature_count() == exact.get_feature_count()
    assert packed.get_descriptor_count() == exact.get_descriptor_count()
    np.testing.assert_allclose(
        np.sort(np.asarray(packed.get_descriptors()), axis=0),
        np.sort(np.asarray(exact.get_descriptors()), axis=0),
        rtol=1e-4, atol=2e-5)


def test_u8p_prefix_decode_and_refetch(blob_image):
    """u8p wire format: the nz-sized prefix decodes exactly the complete
    rows it covers, and the collect path's sufficiency check still
    triggers a full refetch when the prefix under-covers."""
    norm = blob_image.astype(np.float32) / 255.0
    cfg = Config()
    cfg.desc_transfer = "u8p"
    ex = StagedExtractor(cfg, norm.shape[1], norm.shape[0])
    f0 = ex.extract_features(norm)
    f1 = ex.extract_features(norm)      # packed path, full fetch
    np.testing.assert_array_equal(np.asarray(f0.get_descriptors()),
                                  np.asarray(f1.get_descriptors()))

    # force a tiny nz estimate: prefix under-fetches, refetch kicks in
    # (drop the 64 KiB fetch quantum so the small test buffer can have a
    # proper prefix at all)
    ex.WIRE_GRAN = 64
    ex._note_nz(8)
    key = ex._last_key5
    n = ex.wire_prefix_words(key)
    assert n is not None and n < ex._flat_layout(key)["_total"]
    f2 = ex.extract_features(norm)
    np.testing.assert_array_equal(np.asarray(f0.get_descriptors()),
                                  np.asarray(f2.get_descriptors()))
