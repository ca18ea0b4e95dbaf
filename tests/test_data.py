"""Data-layer tests: VOC parsing, windowing, augmentation, converters,
synthetic dataset, generators (detection / sequence / tracker-priors)."""

import os
import xml.etree.ElementTree as ET

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from object_tracking_tpu.data import (
    AugmentConfig, DetectionBatches, SequenceBatches,
    TrackerSequenceBatches, augment_frame, augment_sequence,
    make_sequence_windows, mot_to_voc, parse_annotation,
    parse_annotation_dir, visualtb_to_voc)
from object_tracking_tpu.data.synthetic import (
    make_synthetic_annotations, make_synthetic_dataset)
from object_tracking_tpu.models import FakeDetector


# ----------------------------------------------------------------- voc
def _write_xml(path, folder, filename, objects, size=(100, 80)):
    ann = ET.Element('annotation')
    ET.SubElement(ann, 'folder').text = folder
    ET.SubElement(ann, 'filename').text = filename
    s = ET.SubElement(ann, 'size')
    ET.SubElement(s, 'width').text = str(size[0])
    ET.SubElement(s, 'height').text = str(size[1])
    for name, box, tid in objects:
        o = ET.SubElement(ann, 'object')
        ET.SubElement(o, 'name').text = name
        ET.SubElement(o, 'trackid').text = str(tid)
        bb = ET.SubElement(o, 'bndbox')
        for k, v in zip(('xmin', 'ymin', 'xmax', 'ymax'), box):
            ET.SubElement(bb, k).text = str(v)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ET.ElementTree(ann).write(path)


def test_parse_annotation_basic(tmp_path):
    p = tmp_path / 'v1' / 'f1.xml'
    _write_xml(str(p), 'v1', 'f1.jpg',
               [('car', (1, 2, 30, 40), 7), ('dog', (5, 5, 20, 20), 8)])
    ann = parse_annotation(str(p), str(tmp_path / 'img'))
    assert ann.folder == 'v1'
    assert ann.filename.endswith(os.path.join('img', 'v1', 'f1.jpg'))
    assert ann.width == 100 and ann.height == 80
    assert [o.label for o in ann.objects] == ['car', 'dog']
    assert [o.trackid for o in ann.objects] == [7, 8]


def test_parse_annotation_label_filter_and_census(tmp_path):
    p = tmp_path / 'f.xml'
    _write_xml(str(p), '', 'f.jpg',
               [('car', (1, 2, 3, 4), 0), ('dog', (1, 2, 3, 4), 1)])
    seen = {}
    ann = parse_annotation(str(p), str(tmp_path), labels=['car'],
                           seen=seen)
    assert [o.label for o in ann.objects] == ['car']
    assert seen == {'car': 1, 'dog': 1}     # census counts filtered too


def test_parse_annotation_jpeg_fallback_and_empty(tmp_path):
    # No-extension filename gets .JPEG (ImageNet-VID convention).
    p = tmp_path / 'f.xml'
    _write_xml(str(p), 'vid', '000001', [('car', (1, 2, 3, 4), 0)])
    ann = parse_annotation(str(p), '/imgs')
    assert ann.filename.endswith('000001.JPEG')
    # All objects filtered away → None (reference drops empty images).
    assert parse_annotation(str(p), '/imgs', labels=['bird']) is None


def test_parse_annotation_dir_sorted(tmp_path):
    for v, f in [('b', '2'), ('a', '1'), ('b', '1')]:
        _write_xml(str(tmp_path / 'ann' / v / f'{f}.xml'), v, f'{f}.jpg',
                   [('car', (1, 2, 3, 4), 0)])
    anns, seen = parse_annotation_dir(str(tmp_path / 'ann'),
                                      str(tmp_path))
    assert len(anns) == 3
    assert seen == {'car': 3}
    names = [(a.folder, os.path.basename(a.filename)) for a in anns]
    assert names == sorted(names)


# ------------------------------------------------------------- windows
def test_windows_respect_video_boundaries():
    anns = make_synthetic_annotations(num_videos=2, frames_per_video=5)
    wins = make_sequence_windows(anns, 3)
    assert len(wins) == 2 * (5 - 3 + 1)
    for w in wins:
        assert len({a.folder for a in w}) == 1
        frames = [int(os.path.basename(a.filename)[:4]) for a in w]
        assert frames == list(range(frames[0], frames[0] + 3))


def test_windows_stride_and_edge_cases():
    anns = make_synthetic_annotations(num_videos=1, frames_per_video=6)
    assert len(make_sequence_windows(anns, 2, stride=2)) == 3
    assert make_sequence_windows(anns, 7) == []
    with pytest.raises(ValueError):
        make_sequence_windows(anns, 0)


# ------------------------------------------------------------- augment
def test_augment_frame_shapes_and_determinism(rng):
    img = jnp.asarray(rng.rand(32, 32, 3), jnp.float32)
    boxes = jnp.asarray([[4.0, 4.0, 16.0, 16.0]], jnp.float32)
    k = jax.random.PRNGKey(1)
    i1, b1 = augment_frame(k, img, boxes)
    i2, b2 = augment_frame(k, img, boxes)
    assert i1.shape == img.shape and b1.shape == boxes.shape
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(b1), np.asarray(b2))
    assert float(jnp.min(i1)) >= 0.0 and float(jnp.max(i1)) <= 1.0
    b = np.asarray(b1)
    assert (b[:, [0, 1]] >= 0).all() and (b[:, 2] <= 32).all() \
        and (b[:, 3] <= 32).all()


def test_augment_identity_when_disabled(rng):
    """With all probabilities 0 and scale 1, augmentation ≈ identity."""
    cfg = AugmentConfig(scale_max=1.0 + 1e-9, flip_prob=0.0,
                        blur_prob=0.0, noise_prob=0.0, dropout_prob=0.0,
                        brightness_prob=0.0, multiply_prob=0.0,
                        contrast_prob=0.0)
    img = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
    boxes = jnp.asarray([[2.0, 3.0, 10.0, 12.0]], jnp.float32)
    out, b = augment_frame(jax.random.PRNGKey(0), img, boxes, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(b), np.asarray(boxes),
                               atol=1e-3)


def test_augment_flip_mirrors_boxes(rng):
    cfg = AugmentConfig(scale_max=1.0 + 1e-9, flip_prob=1.0,
                        blur_prob=0.0, noise_prob=0.0, dropout_prob=0.0,
                        brightness_prob=0.0, multiply_prob=0.0,
                        contrast_prob=0.0)
    img = jnp.asarray(rng.rand(16, 16, 3), jnp.float32)
    boxes = jnp.asarray([[2.0, 3.0, 10.0, 12.0]], jnp.float32)
    out, b = augment_frame(jax.random.PRNGKey(0), img, boxes, cfg)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(img[:, ::-1]), atol=1e-4)
    np.testing.assert_allclose(np.asarray(b),
                               np.asarray([[6.0, 3.0, 14.0, 12.0]]),
                               atol=1e-3)


def test_augment_sequence_coherent(rng):
    """Every frame in a window gets the same transform (one key)."""
    imgs = jnp.asarray(np.stack([rng.rand(16, 16, 3)] * 3), jnp.float32)
    boxes = jnp.asarray(np.tile([[2.0, 3.0, 10.0, 12.0]], (3, 1, 1)),
                        jnp.float32)
    out, b = augment_sequence(jax.random.PRNGKey(3), imgs, boxes)
    for t in range(1, 3):
        np.testing.assert_allclose(np.asarray(out[0]),
                                   np.asarray(out[t]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(b[0]), np.asarray(b[t]),
                                   atol=1e-5)


# ---------------------------------------------------------- converters
def test_mot_to_voc_roundtrip(tmp_path):
    seq = tmp_path / 'mot' / 'train' / 'SEQ-01'
    (seq / 'gt').mkdir(parents=True)
    (seq / 'seqinfo.ini').write_text(
        '[Sequence]\nname=SEQ-01\nimDir=img1\nframeRate=30\n'
        'seqLength=4\nimWidth=640\nimHeight=480\nimExt=.jpg\n')
    rows = [
        '1,1,10,20,30,40,1,1,1.0', '1,2,50,60,20,20,1,3,1.0',
        '2,1,12,22,30,40,1,1,1.0', '3,1,14,24,30,40,1,1,1.0',
        '4,1,16,26,30,40,1,1,1.0',
    ]
    (seq / 'gt' / 'gt.txt').write_text('\n'.join(rows) + '\n')

    out = tmp_path / 'voc'
    n = mot_to_voc([str(tmp_path / 'mot' / 'train')], str(out),
                   validation_split=0.25)
    assert n == 4
    assert len(os.listdir(out / 'train' / 'SEQ-01')) == 3   # 75/25 split
    assert len(os.listdir(out / 'val' / 'SEQ-01')) == 1

    anns, _ = parse_annotation_dir(str(out / 'train'), '/imgs')
    assert len(anns) == 3
    first = [a for a in anns if a.filename.endswith('000001.jpg')][0]
    assert first.width == 640 and first.height == 480
    assert {o.label for o in first.objects} == {'1', '3'}
    car = [o for o in first.objects if o.label == '1'][0]
    assert (car.xmin, car.ymin, car.xmax, car.ymax) == (10, 20, 40, 60)
    assert car.trackid == 1
    assert first.folder == 'SEQ-01/img1'


def test_visualtb_to_voc_quirks(tmp_path):
    seq = tmp_path / 'tb' / 'Walking'
    seq.mkdir(parents=True)
    # whitespace-delimited rows (the reference hardcodes which dirs use
    # spaces; we sniff per line)
    (seq / 'groundtruth_rect.txt').write_text(
        '10 20 30 40\n12,22,30,40\n14 24 30 40\n16 26 30 40\n')
    out_t, out_v = tmp_path / 'ann_t', tmp_path / 'ann_v'
    n = visualtb_to_voc(str(tmp_path / 'tb'), str(out_t), str(out_v),
                        class_map={'Walking': 'Person'},
                        image_size=(640, 360))
    assert n == 4
    anns, _ = parse_annotation_dir(str(out_t), '/imgs')
    assert len(anns) == 3
    assert anns[0].objects[0].label == 'Person'
    assert anns[0].objects[0].trackid == 0
    assert anns[0].folder == 'Walking/img'


def test_visualtb_multi_gt_trackids(tmp_path):
    seq = tmp_path / 'tb' / 'Jogging'
    seq.mkdir(parents=True)
    (seq / 'groundtruth_rect.1.txt').write_text('1,1,5,5\n2,2,5,5\n')
    (seq / 'groundtruth_rect.2.txt').write_text('8,8,5,5\n9,9,5,5\n')
    out_t, out_v = tmp_path / 't', tmp_path / 'v'
    visualtb_to_voc(str(tmp_path / 'tb'), str(out_t), str(out_v),
                    class_map={'Jogging': 'Person'},
                    image_size=(100, 100), validation_split=0.0)
    anns, _ = parse_annotation_dir(str(out_t), '/imgs')
    # two GT files → two tracks, merged per frame
    by_frame = {os.path.basename(a.filename): a for a in anns}
    assert {o.trackid for o in by_frame['0001.jpg'].objects} == {0, 1}


# ----------------------------------------------------------- synthetic
@pytest.fixture(scope='module')
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp('synth')
    img_dir, ann_dir = make_synthetic_dataset(
        str(root), num_videos=2, frames_per_video=6,
        image_size=(64, 64), labels=('1',))
    return img_dir, ann_dir


def test_synthetic_dataset_parses(synth):
    img_dir, ann_dir = synth
    anns, seen = parse_annotation_dir(ann_dir, img_dir, labels=['1'])
    assert len(anns) == 12
    assert seen == {'1': 12}
    assert os.path.exists(anns[0].filename)


def test_synthetic_multi_object_scenes(tmp_path):
    """Round-3 scene knobs: N simultaneous objects with stable distinct
    trackids, crossing trajectories that actually intersect, occlusion
    spans that drop GT mid-track then restore the same trackid, and
    clutter that never emits annotations."""
    img_dir, ann_dir = make_synthetic_dataset(
        str(tmp_path), num_videos=2, frames_per_video=12,
        image_size=(128, 128), labels=('1', '2'), objects_per_video=3,
        crossing=True, occlusion_frames=2, clutter=2, seed=3)
    anns, _ = parse_annotation_dir(ann_dir, img_dir,
                                   labels=['1', '2'])
    by_video = {}
    for a in anns:
        by_video.setdefault(a.folder, []).append(a)
    assert len(by_video) == 2
    all_tids = set()
    for folder, frames in by_video.items():
        frames.sort(key=lambda a: a.filename)
        tids = {o.trackid for a in frames for o in a.objects}
        assert len(tids) == 3, (folder, tids)      # 3 tracks per video
        assert tids.isdisjoint(all_tids)           # globally unique ids
        all_tids |= tids
        counts = [len(a.objects) for a in frames]
        assert max(counts) == 3                    # simultaneous objects
        assert min(counts) < 3                     # occlusion drops GT
        # every occluded track reappears with its original id
        for tid in tids:
            present = [i for i, a in enumerate(frames)
                       if any(o.trackid == tid for o in a.objects)]
            assert present[0] < 2 and present[-1] >= len(frames) - 3, \
                (tid, present)
        # crossing: some pair of track centers comes close mid-clip
        centers = {tid: {} for tid in tids}
        for i, a in enumerate(frames):
            for o in a.objects:
                centers[o.trackid][i] = ((o.xmin + o.xmax) / 2,
                                         (o.ymin + o.ymax) / 2)
        t = sorted(tids)
        min_d = min(
            ((centers[a_][i][0] - centers[b_][i][0]) ** 2
             + (centers[a_][i][1] - centers[b_][i][1]) ** 2) ** 0.5
            for a_ in t for b_ in t if a_ < b_
            for i in centers[a_] if i in centers[b_])
        assert min_d < 48, min_d                  # paths approach/cross
    # clutter is drawn but never annotated: labels census only GT counts
    assert all(len(a.objects) <= 3 for a in anns)


# ---------------------------------------------------------- generators
def test_detection_batches_shapes(synth):
    img_dir, ann_dir = synth
    anns, _ = parse_annotation_dir(ann_dir, img_dir, labels=['1'])
    gen = DetectionBatches(
        anns, ['1'], net_h=64, net_w=64, grid_h=2, grid_w=2,
        anchors=[1.0, 1.0, 2.0, 2.0], batch_size=4, max_boxes=10,
        augment=True, seed=0)
    batches = list(gen())
    assert len(batches) == len(gen) == 3
    b = batches[0]
    assert b['images'].shape == (4, 64, 64, 3)
    assert b['y_true'].shape == (4, 2, 2, 2, 5 + 1)
    assert b['true_boxes'].shape == (4, 1, 1, 1, 10, 4)
    # every synthetic frame has exactly one object
    assert b['y_true'][..., 4].sum() == 4
    # epoch 2 reshuffles but keeps shapes
    assert len(list(gen())) == 3


def test_sequence_batches_shapes(synth):
    img_dir, ann_dir = synth
    anns, _ = parse_annotation_dir(ann_dir, img_dir, labels=['1'])
    wins = make_sequence_windows(anns, 3)
    gen = SequenceBatches(
        wins, ['1'], net_h=64, net_w=64, grid_h=2, grid_w=2,
        anchors=[1.0, 1.0], batch_size=2, max_boxes=5, augment=True,
        seed=0)
    b = next(iter(gen()))
    assert b['images'].shape == (2, 3, 64, 64, 3)
    assert b['y_true'].shape == (2, 3, 2, 2, 1, 6)
    assert b['true_boxes'].shape == (2, 3, 1, 1, 1, 5, 4)
    assert b['y_true'][..., 4].sum() == 6


def test_tracker_sequence_batches_bbox_and_heatmap(synth):
    img_dir, ann_dir = synth
    anns, _ = parse_annotation_dir(ann_dir, img_dir, labels=['1'])
    wins = make_sequence_windows(anns, 3)
    det = FakeDetector(feat_shape=(4, 4, 8), num_labels=1, label_id=0,
                       box=(0.5, 0.5, 0.4, 0.4))

    gen = TrackerSequenceBatches(
        wins, ['1'], det, net_h=64, net_w=64, batch_size=2,
        target_mode='bbox', augment=False, seed=0)
    b = next(iter(gen()))
    assert b['feats'].shape == (2, 3, 4, 4, 8)
    assert b['det'].shape == (2, 3, 4)
    assert b['target'].shape == (2, 3, 4)
    # fake detector's single det (class matches) flows into det input
    np.testing.assert_allclose(b['det'][0, 0], [0.5, 0.5, 0.4, 0.4])
    # target = normalized center-format GT, inside [0, 1]
    assert (b['target'] >= 0).all() and (b['target'] <= 1).all()

    ghm = TrackerSequenceBatches(
        wins, ['1'], det, net_h=64, net_w=64, batch_size=2,
        target_mode='heatmap', heatmap_size=8, augment=False, seed=0)
    hb = next(iter(ghm()))
    assert hb['det'].shape == (2, 3, 64)
    assert hb['target'].shape == (2, 3, 64)
    assert set(np.unique(hb['target'])) <= {0.0, 1.0}
    assert hb['target'].sum() > 0


def test_tracker_batches_precompute_is_cached(synth):
    img_dir, ann_dir = synth
    anns, _ = parse_annotation_dir(ann_dir, img_dir, labels=['1'])
    wins = make_sequence_windows(anns, 2)

    calls = []

    class CountingFake(FakeDetector):
        def forward_batch(self, images, layer='conv_feat', top_k=None):
            calls.append(images.shape[0])
            return super().forward_batch(images, layer, top_k)

    det = CountingFake(feat_shape=(2, 2, 4), num_labels=1)
    gen = TrackerSequenceBatches(wins, ['1'], det, net_h=32, net_w=32,
                                 batch_size=2, augment=False, seed=0)
    list(gen())
    first_epoch_calls = sum(calls)
    list(gen())
    # precompute ran once over unique frames; epoch 2 is cache-only
    assert sum(calls) == first_epoch_calls == 12


def test_tracker_batches_augment_per_epoch(synth):
    """Reference parity (preprocessing.py:398-401): with augment on, each
    epoch augments the frames BEFORE the detector pass, so priors (here:
    FakeDetector feats = mean pixel) and targets vary across epochs; with
    augment off they are bit-identical."""
    img_dir, ann_dir = synth
    anns, _ = parse_annotation_dir(ann_dir, img_dir, labels=['1'])
    wins = make_sequence_windows(anns, 2)
    det = FakeDetector(feat_shape=(2, 2, 4), num_labels=1, label_id=0)

    def epoch_tensors(gen):
        feats, targets = [], []
        for b in gen():
            feats.append(b['feats'])
            targets.append(b['target'])
        return np.concatenate(feats), np.concatenate(targets)

    aug = TrackerSequenceBatches(wins, ['1'], det, net_h=32, net_w=32,
                                 batch_size=2, augment=True, seed=0,
                                 drop_last=False)
    f1, t1 = epoch_tensors(aug)
    f2, t2 = epoch_tensors(aug)
    # shuffling is seeded per-generator, not per-epoch, so differences
    # come from augmentation alone once sorted; mean-feat varies.
    assert np.abs(f1 - f2).max() > 0
    assert b_shape_ok(f1, (len(wins), 2, 2, 2, 4))

    plain = TrackerSequenceBatches(wins, ['1'], det, net_h=32, net_w=32,
                                   batch_size=2, augment=False, seed=0,
                                   drop_last=False)
    p1, q1 = epoch_tensors(plain)
    p2, q2 = epoch_tensors(plain)
    np.testing.assert_array_equal(np.sort(p1.ravel()),
                                  np.sort(p2.ravel()))
    np.testing.assert_array_equal(np.sort(q1.ravel()),
                                  np.sort(q2.ravel()))


def b_shape_ok(arr, shape):
    return arr.shape == shape


def test_convert_cli_mot(tmp_path):
    """`trainer convert mot` — the runnable-converter parity with the
    reference's utility/motd_to_pascal.py:127 entry point."""
    from object_tracking_tpu.trainer import main as trainer_main
    seq = tmp_path / 'mot' / 'train' / 'SEQ-02'
    (seq / 'gt').mkdir(parents=True)
    (seq / 'seqinfo.ini').write_text(
        '[Sequence]\nname=SEQ-02\nimDir=img1\nframeRate=30\n'
        'seqLength=4\nimWidth=320\nimHeight=240\nimExt=.jpg\n')
    (seq / 'gt' / 'gt.txt').write_text(
        '1,1,10,20,30,40,1,1,1.0\n2,1,12,22,30,40,1,1,1.0\n'
        '3,1,14,24,30,40,1,1,1.0\n4,1,16,26,30,40,1,1,1.0\n')
    out = tmp_path / 'voc'
    rc = trainer_main(['convert', 'mot', '--src', str(tmp_path / 'mot'),
                       '--out', str(out)])
    assert rc == 0
    assert len(os.listdir(out / 'train' / 'SEQ-02')) == 3


def test_convert_cli_visualtb_with_legacy_class_map(tmp_path):
    import json
    from object_tracking_tpu.trainer import main as trainer_main
    seq = tmp_path / 'tb' / 'Walking'
    seq.mkdir(parents=True)
    (seq / 'groundtruth_rect.txt').write_text(
        '10 20 30 40\n12,22,30,40\n')
    cmap = tmp_path / 'config.json'
    # legacy reference layout: classes_map block (config.json:49-125)
    cmap.write_text(json.dumps({'classes_map': {'Walking': 'Person'}}))
    # image_size probe needs a first frame on disk
    import cv2
    img_dir = seq / 'img'
    img_dir.mkdir()
    cv2.imwrite(str(img_dir / '0001.jpg'),
                np.zeros((60, 80, 3), np.uint8))
    out = tmp_path / 'out'
    rc = trainer_main(['convert', 'visualtb', '--src',
                       str(tmp_path / 'tb'), '--out', str(out),
                       '--class-map', str(cmap)])
    assert rc == 0
    anns, _ = parse_annotation_dir(str(out / 'train'), '/imgs')
    assert anns and anns[0].objects[0].label == 'Person'


def test_parse_annotation_dir_cache(tmp_path, synth):
    """Pickle cache (reference KerasYOLO.py:421-439 parity): second parse
    is served from cache; touching an XML invalidates it."""
    import pickle
    img_dir, ann_dir = synth
    cache = tmp_path / 'cache'
    a1, s1 = parse_annotation_dir(ann_dir, img_dir, labels=['1'],
                                  cache_dir=str(cache))
    files = list(cache.glob('annotations_*.pkl'))
    assert len(files) == 1
    # Poison the cache payload to prove the next call reads it.
    with open(files[0], 'rb') as f:
        anns, seen = pickle.load(f)
    with open(files[0], 'wb') as f:
        pickle.dump((anns[:1], seen), f)
    a2, _ = parse_annotation_dir(ann_dir, img_dir, labels=['1'],
                                 cache_dir=str(cache))
    assert len(a2) == 1
    # mtime bump → key changes → fresh parse.
    xml = next(p for p in os.scandir(os.path.join(ann_dir, 'video_00'))
               if p.name.endswith('.xml'))
    os.utime(xml.path, (os.path.getmtime(xml.path) + 10,) * 2)
    a3, _ = parse_annotation_dir(ann_dir, img_dir, labels=['1'],
                                 cache_dir=str(cache))
    assert len(a3) == len(a1)


def test_synthetic_mot17_ratchet_knobs(tmp_path):
    """Round-5 scene knobs: crowded frames (6+ objects), per-object
    occlusion spans drawn from a range, per-object scale diversity, and
    camera pan that shifts GT coherently and drops out-of-view GT while
    preserving trackids."""
    img_dir, ann_dir = make_synthetic_dataset(
        str(tmp_path), num_videos=1, frames_per_video=16,
        image_size=(192, 192), labels=('1', '2'), objects_per_video=6,
        crossing=True, occlusion_frames=(4, 6), clutter=3,
        object_scale_jitter=0.4, camera_pan=0.15, seed=7)
    anns, _ = parse_annotation_dir(ann_dir, img_dir, labels=['1', '2'])
    frames = sorted(anns, key=lambda a: a.filename)
    assert len(frames) == 16
    counts = [len(a.objects) for a in frames]
    assert max(counts) == 6                    # crowded frames exist
    assert min(counts) < 6                     # occlusion/pan drop GT
    # per-object occlusion spans between 4 and 6 frames: every track
    # misses at least 4 consecutive frames somewhere mid-clip
    tids = {o.trackid for a in frames for o in a.objects}
    assert len(tids) == 6
    # scale diversity: the per-frame box areas differ across objects
    areas = {}
    for a in frames:
        for o in a.objects:
            areas.setdefault(o.trackid, []).append(
                (o.xmax - o.xmin) * (o.ymax - o.ymin))
    max_area = {t: max(v) for t, v in areas.items()}
    assert max(max_area.values()) > 1.5 * min(max_area.values()), \
        max_area
    # all GT stays inside the frame after the pan clip
    for a in frames:
        for o in a.objects:
            assert 0 <= o.xmin < o.xmax <= 192
            assert 0 <= o.ymin < o.ymax <= 192


def test_synthetic_occlusion_range_scalar_equivalence(tmp_path):
    """A scalar occlusion span and a degenerate (k, k) range produce
    identically-shaped datasets (the knob is backward compatible)."""
    d1 = make_synthetic_dataset(
        str(tmp_path / 'a'), num_videos=1, frames_per_video=10,
        image_size=(96, 96), labels=('1',), objects_per_video=2,
        occlusion_frames=2, seed=3)
    d2 = make_synthetic_dataset(
        str(tmp_path / 'b'), num_videos=1, frames_per_video=10,
        image_size=(96, 96), labels=('1',), objects_per_video=2,
        occlusion_frames=(2, 2), seed=3)
    a1, _ = parse_annotation_dir(d1[1], d1[0], labels=['1'])
    a2, _ = parse_annotation_dir(d2[1], d2[0], labels=['1'])
    assert [len(a.objects) for a in a1] == [len(a.objects) for a in a2]
