"""Darknet `.cfg` → JAX model compiler.

The reference consumes the darknet C library through ctypes
(/root/reference/models_detection/YOLO.py:58-119) where
`config_file: cfg/yolov2.cfg` (config.json:4) can name ANY darknet
network description — the C `load_network` builds whatever graph the cfg
describes. The reference pins yolov2.cfg, but the *capability* of that
boundary is "compile a darknet cfg". This module rebuilds that capability
TPU-natively: parse the cfg, emit a flax module whose convs tile onto the
MXU, and ingest the matching `.weights` stream in cfg order (superset of
ops/weights.py's fixed Darknet-19 plan).

Supported sections (covers yolov2, yolov2-tiny, and yolov3-style graphs):
  [net]            input geometry
  [convolutional]  conv (+optional BN) + leaky/linear activation
  [maxpool]        incl. the size-2/stride-1 tiny-yolo edge case
  [reorg]          space-to-depth (the YOLOv2 passthrough)
  [route]          concat of earlier layer outputs (negative or absolute)
  [shortcut]       residual add (yolov3)
  [upsample]       nearest-neighbour ×stride (yolov3)
  [region]         YOLOv2 head marker: anchors in grid-cell units
  [yolo]           YOLOv3 head marker: masked anchors in input pixels

Heads are metadata, not compute: the forward returns the raw feature map
of every head layer (arrays only, so the whole apply is jittable), the
static cfg-declared anchor/class info lives in `head_specs(plan)`, and
`decode_cfg_outputs` routes v2 heads through ops/decode.decode_netout and
v3 heads through `decode_yolo3_netout` below.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from object_tracking_tpu.ops.weights import DarknetWeightReader


# --------------------------------------------------------------------------
# cfg parsing
# --------------------------------------------------------------------------
def parse_darknet_cfg(text: str) -> List[Dict[str, str]]:
    """Parse darknet's INI-like cfg into [{'type': ..., option: value}].

    Duplicate section names are positional (darknet semantics); comments
    start with '#' or ';'.
    """
    sections: List[Dict[str, str]] = []
    current: Optional[Dict[str, str]] = None
    for raw in text.splitlines():
        line = raw.strip()
        if not line or line[0] in '#;':
            continue
        if line.startswith('['):
            current = {'type': line.strip('[] ').lower()}
            sections.append(current)
        elif '=' in line and current is not None:
            key, _, value = line.partition('=')
            current[key.strip()] = value.strip()
    return sections


def _ints(s: str) -> Tuple[int, ...]:
    return tuple(int(v) for v in s.replace(' ', '').split(',') if v)


def _floats(s: str) -> Tuple[float, ...]:
    return tuple(float(v) for v in s.replace(' ', '').split(',') if v)


# A compiled layer plan: hashable nested tuples so the flax module (a
# frozen dataclass) can carry it and jit treats it as static.
#   ('conv', filters, size, stride, bn, activation)
#   ('maxpool', size, stride)
#   ('reorg', stride)
#   ('route', (idx, ...))            absolute layer indices
#   ('shortcut', idx, activation)
#   ('upsample', stride)
#   ('region', anchors, num, classes)     anchors: flat grid-cell units
#   ('yolo', anchors, classes)            anchors: (w, h) pixel pairs
LayerPlan = Tuple[Any, ...]


def compile_cfg(sections: Sequence[Dict[str, str]]
                ) -> Tuple[Tuple[int, int, int], Tuple[LayerPlan, ...]]:
    """Resolve a parsed cfg into (input_hwc, layer plan tuple)."""
    assert sections and sections[0]['type'] in ('net', 'network'), \
        'cfg must start with [net]'
    net = sections[0]
    in_hwc = (int(net.get('height', 416)), int(net.get('width', 416)),
              int(net.get('channels', 3)))
    plan: List[LayerPlan] = []
    for i, sec in enumerate(sections[1:]):
        t = sec['type']
        if t == 'convolutional':
            plan.append((
                'conv', int(sec.get('filters', 1)),
                int(sec.get('size', 1)), int(sec.get('stride', 1)),
                int(sec.get('batch_normalize', 0)) == 1,
                sec.get('activation', 'linear')))
        elif t == 'maxpool':
            plan.append(('maxpool', int(sec.get('size', 2)),
                         int(sec.get('stride', 2))))
        elif t == 'reorg':
            plan.append(('reorg', int(sec.get('stride', 2))))
        elif t == 'route':
            refs = _ints(sec['layers'])
            plan.append(('route', tuple(
                r if r >= 0 else len(plan) + r for r in refs)))
        elif t == 'shortcut':
            r = int(sec['from'])
            plan.append(('shortcut',
                         r if r >= 0 else len(plan) + r,
                         sec.get('activation', 'linear')))
        elif t == 'upsample':
            plan.append(('upsample', int(sec.get('stride', 2))))
        elif t == 'region':
            plan.append(('region', _floats(sec.get('anchors', '')),
                         int(sec.get('num', 5)),
                         int(sec.get('classes', 20))))
        elif t == 'yolo':
            mask = _ints(sec.get('mask', ''))
            flat = _floats(sec.get('anchors', ''))
            pairs = tuple(zip(flat[::2], flat[1::2]))
            chosen = tuple(pairs[m] for m in mask) if mask else pairs
            plan.append(('yolo', chosen, int(sec.get('classes', 80))))
        else:
            raise ValueError(f'unsupported cfg section [{t}] (index {i})')
    return in_hwc, tuple(plan)


# --------------------------------------------------------------------------
# the compiled network
# --------------------------------------------------------------------------
def _space_to_depth(x: jnp.ndarray, stride: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // stride, stride, w // stride, stride, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // stride, w // stride, stride * stride * c)


def _activate(x: jnp.ndarray, kind: str) -> jnp.ndarray:
    if kind == 'leaky':
        return nn.leaky_relu(x, 0.1)
    if kind in ('linear', 'none'):
        return x
    if kind == 'relu':
        return nn.relu(x)
    if kind in ('logistic', 'sigmoid'):
        return jax.nn.sigmoid(x)
    if kind == 'mish':
        return x * jnp.tanh(jax.nn.softplus(x))
    raise ValueError(f'unsupported activation {kind!r}')


def head_specs(plan: Sequence[LayerPlan]) -> Tuple[Dict[str, Any], ...]:
    """Static (non-traced) metadata for each [region]/[yolo] head in plan
    order: {'kind', 'anchors', 'num_classes'}. Pairs with the same-order
    `heads` list of netout arrays returned by DarknetCfgNet.__call__."""
    specs: List[Dict[str, Any]] = []
    for layer in plan:
        if layer[0] == 'region':
            _, anchors, num, classes = layer
            specs.append({'kind': 'region', 'anchors': anchors,
                          'num': num, 'num_classes': classes})
        elif layer[0] == 'yolo':
            _, anchors, classes = layer
            specs.append({'kind': 'yolo', 'anchors': anchors,
                          'num': len(anchors), 'num_classes': classes})
    return tuple(specs)


class DarknetCfgNet(nn.Module):
    """A darknet cfg compiled to flax. Layer i's params are conv_i/norm_i.

    __call__ returns {'heads': [raw (B,GH,GW,A,5+C) netout per head],
    'final': last activation} — arrays only, so `net.apply` jits cleanly.
    The static per-head anchor/class metadata is `head_specs(self.plan)`.
    """
    plan: Tuple[LayerPlan, ...]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        x = images.astype(self.dtype)
        outputs: List[jnp.ndarray] = []
        heads: List[jnp.ndarray] = []
        for i, layer in enumerate(self.plan):
            kind = layer[0]
            if kind == 'conv':
                _, filters, size, stride, bn, act = layer
                # darknet pads (size-1)/2; stride-2 convs crop like VALID
                # on odd inputs — SAME matches all standard yolo cfgs.
                x = nn.Conv(filters, (size, size),
                            strides=(stride, stride), padding='SAME',
                            use_bias=not bn, dtype=self.dtype,
                            name=f'conv_{i}')(x)
                if bn:
                    x = nn.BatchNorm(use_running_average=not train,
                                     momentum=0.99, epsilon=1e-3,
                                     dtype=self.dtype,
                                     name=f'norm_{i}')(x)
                x = _activate(x, act)
            elif kind == 'maxpool':
                _, size, stride = layer
                x = nn.max_pool(x, (size, size), strides=(stride, stride),
                                padding='SAME')
            elif kind == 'reorg':
                x = _space_to_depth(x, layer[1])
            elif kind == 'route':
                refs = layer[1]
                x = outputs[refs[0]] if len(refs) == 1 else \
                    jnp.concatenate([outputs[r] for r in refs], axis=-1)
            elif kind == 'shortcut':
                _, ref, act = layer
                x = _activate(x + outputs[ref], act)
            elif kind == 'upsample':
                s = layer[1]
                b, h, w, c = x.shape
                x = jnp.repeat(jnp.repeat(x, s, axis=1), s, axis=2)
            elif kind == 'region':
                _, anchors, num, classes = layer
                b, gh, gw, _ = x.shape
                heads.append(x.astype(jnp.float32).reshape(
                    b, gh, gw, num, 5 + classes))
            elif kind == 'yolo':
                _, anchors, classes = layer
                b, gh, gw, _ = x.shape
                heads.append(x.astype(jnp.float32).reshape(
                    b, gh, gw, len(anchors), 5 + classes))
            else:  # pragma: no cover — compile_cfg rejects these
                raise ValueError(kind)
            outputs.append(x)
        return {'heads': heads, 'final': x.astype(jnp.float32)}


def build_from_cfg(cfg_text: str, dtype: Any = jnp.float32
                   ) -> Tuple[DarknetCfgNet, Tuple[int, int, int]]:
    """cfg text → (flax module, (H, W, C) input geometry)."""
    in_hwc, plan = compile_cfg(parse_darknet_cfg(cfg_text))
    return DarknetCfgNet(plan=plan, dtype=dtype), in_hwc


# --------------------------------------------------------------------------
# weight ingestion in cfg order
# --------------------------------------------------------------------------
def load_weights_for_cfg(path: str, cfg_text: str) -> Dict[str, Any]:
    """Read a darknet `.weights` stream following the cfg's conv order.

    Darknet serializes, per conv layer: [bias | bn(beta, gamma, mean,
    var)] then the OIHW kernel (utility/utils.py:138-148 reads the same
    stream; KerasYOLO.py:244-274 fixes the order for Darknet-19 — this
    generalizes it to any cfg). Returns {'params', 'batch_stats'} keyed
    conv_i/norm_i to match DarknetCfgNet.
    """
    in_hwc, plan = compile_cfg(parse_darknet_cfg(cfg_text))
    reader = DarknetWeightReader(path)
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    # Track channel counts through the graph to size each kernel.
    channels: List[int] = []
    cin = in_hwc[2]
    for i, layer in enumerate(plan):
        kind = layer[0]
        if kind == 'conv':
            _, filters, size, stride, bn, _act = layer
            if bn:
                beta = reader.read(filters)
                gamma = reader.read(filters)
                mean = reader.read(filters)
                var = reader.read(filters)
                params[f'norm_{i}'] = {'scale': gamma, 'bias': beta}
                batch_stats[f'norm_{i}'] = {'mean': mean, 'var': var}
            else:
                bias = reader.read(filters)
            kernel = reader.read(filters * cin * size * size).reshape(
                filters, cin, size, size).transpose(2, 3, 1, 0)
            entry: Dict[str, Any] = {
                'kernel': np.ascontiguousarray(kernel)}
            if not bn:
                entry['bias'] = bias
            params[f'conv_{i}'] = entry
            cin = filters
        elif kind == 'reorg':
            cin = cin * layer[1] * layer[1]
        elif kind == 'route':
            cin = sum(channels[r] for r in layer[1])
        elif kind in ('maxpool', 'upsample', 'shortcut', 'region',
                      'yolo'):
            pass
        channels.append(cin)
    if reader.remaining:
        raise ValueError(
            f'{reader.remaining} floats left over after cfg plan — '
            'cfg/weights mismatch (or a header-version mismatch: darknet '
            'writes a 4- or 5-float header depending on its version; the '
            'reader sizes the skip from the (major, minor) header ints)')
    return {'params': params, 'batch_stats': batch_stats}


def export_weights_for_cfg(variables, cfg_text: str, path: str,
                           seen: int = 0) -> None:
    """Serialize DarknetCfgNet variables to a darknet `.weights` binary in
    cfg order — the exact inverse of `load_weights_for_cfg`. Writes the
    modern 5-slot header (int32 major/minor/revision + uint64 seen), the
    same layout as stock pjreddie weight files.

    The reference consumes this format read-only (utility/utils.py:138-148);
    here it is a two-way interchange format, so a model trained in this
    framework can be handed back to any darknet-compatible runtime, and
    tests can exercise the real ingestion path on independently-produced
    files (tests/fixtures).
    """
    from object_tracking_tpu.ops.weights import write_darknet_header
    _, plan = compile_cfg(parse_darknet_cfg(cfg_text))
    params = variables['params']
    stats = variables.get('batch_stats', {})
    with open(path, 'wb') as f:
        write_darknet_header(f, seen)
        for i, layer in enumerate(plan):
            if layer[0] != 'conv':
                continue
            bn = layer[4]
            if bn:
                np.asarray(params[f'norm_{i}']['bias'],
                           np.float32).tofile(f)
                np.asarray(params[f'norm_{i}']['scale'],
                           np.float32).tofile(f)
                np.asarray(stats[f'norm_{i}']['mean'],
                           np.float32).tofile(f)
                np.asarray(stats[f'norm_{i}']['var'],
                           np.float32).tofile(f)
            else:
                np.asarray(params[f'conv_{i}']['bias'],
                           np.float32).tofile(f)
            np.asarray(params[f'conv_{i}']['kernel'],
                       np.float32).transpose(3, 2, 0, 1).tofile(f)


# --------------------------------------------------------------------------
# head decoding
# --------------------------------------------------------------------------
@functools.partial(
    jax.jit, static_argnames=('net_size', 'obj_threshold'))
def decode_yolo3_netout(netout: jnp.ndarray, anchors: jnp.ndarray,
                        net_size: Tuple[int, int],
                        obj_threshold: float = 0.5):
    """YOLOv3 head decode: sigmoid xy + cell offset, pixel anchors scaled
    by the net input size, sigmoid (not softmax) class scores.

    netout (GH, GW, A, 5+C) → (boxes (GH·GW·A, 4) center-format relative,
    scores (GH·GW·A, C) thresholded).
    """
    gh, gw, na = netout.shape[:3]
    anchors = jnp.asarray(anchors, jnp.float32).reshape(na, 2)
    conf = jax.nn.sigmoid(netout[..., 4:5])
    probs = conf * jax.nn.sigmoid(netout[..., 5:])
    probs = probs * (probs > obj_threshold)

    col = jax.lax.broadcasted_iota(jnp.float32, (gh, gw, na), 1)
    row = jax.lax.broadcasted_iota(jnp.float32, (gh, gw, na), 0)
    x = (col + jax.nn.sigmoid(netout[..., 0])) / gw
    y = (row + jax.nn.sigmoid(netout[..., 1])) / gh
    w = anchors[None, None, :, 0] * jnp.exp(netout[..., 2]) / net_size[1]
    h = anchors[None, None, :, 1] * jnp.exp(netout[..., 3]) / net_size[0]
    boxes = jnp.stack([x, y, w, h], axis=-1).reshape(-1, 4)
    return boxes, probs.reshape(-1, probs.shape[-1])


def decode_cfg_outputs(heads: Sequence[Any],
                       net_size: Tuple[int, int],
                       obj_threshold: float = 0.5,
                       nms_threshold: float = 0.45,
                       top_k: int = 128,
                       specs: Optional[Sequence[Dict[str, Any]]] = None):
    """Decode every head of a DarknetCfgNet forward (batch element 0),
    merge multi-scale candidates, and run one NMS over the union.

    `heads` is the forward's list of raw netout arrays and `specs` the
    matching `head_specs(plan)` metadata. For backward compatibility a
    list of {'kind','netout','anchors',...} dicts is also accepted.

    Returns (boxes (K, 4), labels (K,), scores (K,), valid (K,)).
    """
    from object_tracking_tpu.ops.decode import decode_netout
    from object_tracking_tpu.ops.nms import greedy_nms_scores

    if specs is None:
        specs = [h for h in heads]            # dict-style heads
        heads = [h['netout'] for h in specs]

    all_boxes, all_scores = [], []
    for netout, spec in zip(heads, specs):
        netout = netout[0]
        if spec['kind'] == 'region':
            b, s = decode_netout(netout, spec['anchors'], obj_threshold)
        else:
            b, s = decode_yolo3_netout(
                netout, jnp.asarray(spec['anchors'], jnp.float32),
                net_size, obj_threshold)
        all_boxes.append(b)
        all_scores.append(s)
    boxes = jnp.concatenate(all_boxes, axis=0)
    scores = jnp.concatenate(all_scores, axis=0)
    boxes, scores = greedy_nms_scores(boxes, scores, nms_threshold,
                                      top_k)
    labels = jnp.argmax(scores, axis=-1)
    best = jnp.max(scores, axis=-1)
    return boxes, labels, best, best > obj_threshold


# --------------------------------------------------------------------------
# user-facing detector wrapper
# --------------------------------------------------------------------------
class CfgDetector:
    """YOLOv2Detector-parity wrapper around an arbitrary darknet cfg.

    Mirrors the reference's "hand the C loader any cfg + weights" boundary
    (models_detection/YOLO.py:128-134, config.json:4-6): compile the cfg to
    a flax module, optionally ingest the matching `.weights`, and expose
    `predict`/`detect` with decode+NMS on device. Works for yolov2,
    yolov2-tiny, and yolov3-family cfgs.
    """

    def __init__(self, cfg: str, weights_path: Optional[str] = None,
                 labels: Optional[Sequence[str]] = None,
                 obj_threshold: float = 0.5, nms_threshold: float = 0.45,
                 seed: int = 0, dtype: Any = jnp.float32):
        import os
        text = open(cfg).read() if os.path.exists(cfg) else cfg
        self._cfg_text = text
        self.module, (h, w, c) = build_from_cfg(text, dtype)
        self.specs = head_specs(self.module.plan)
        if not self.specs:
            raise ValueError('cfg has no [region]/[yolo] head')
        self.net_size = (h, w)
        self.obj_threshold = obj_threshold
        self.nms_threshold = nms_threshold
        n_cls = self.specs[0]['num_classes']
        if labels and len(labels) != n_cls:
            # e.g. default COCO-80 labels handed to a 2-class cfg: the
            # cfg's class count is authoritative (darknet reads it from
            # [region]/[yolo] too) — fall back to positional names.
            import warnings
            warnings.warn(
                f'{len(labels)} labels given but cfg declares {n_cls} '
                'classes; using positional class names', stacklevel=2)
            labels = None
        if labels:
            self.labels = tuple(labels)
        elif n_cls == 80:
            # an unnamed 80-class head is COCO in every darknet release
            from object_tracking_tpu.config import LABELS_COCO
            self.labels = LABELS_COCO
        else:
            self.labels = tuple(f'class_{i}' for i in range(n_cls))
        dummy = jnp.zeros((1, h, w, c), jnp.float32)
        self.variables = self.module.init(jax.random.PRNGKey(seed), dummy)
        if weights_path:
            loaded = load_weights_for_cfg(weights_path, text)
            merged = {'params': loaded['params']}
            if loaded['batch_stats']:
                merged['batch_stats'] = loaded['batch_stats']
            self.variables = jax.tree_util.tree_map(jnp.asarray, merged)
        self._forward = jax.jit(
            lambda v, x: self.module.apply(v, x, train=False))
        self._forward_batch_cache: Dict[int, Any] = {}

    def forward(self, images: jnp.ndarray) -> Dict[str, Any]:
        """images (B, H, W, 3) in [0, 1] → {'heads': [...], 'final': ...}."""
        return self._forward(self.variables, images)

    # -- frozen prior-source surface (Pipeline A) ----------------------
    # The reference hands ANY cfg-loaded darknet net to BaseTracker as
    # the frozen detector (BaseTracker.py:53-58 + YOLO.py:128-138); these
    # two methods give the cfg-compiled detector the same pluggability
    # into TrackerSequenceBatches (get_layer_dims + forward_batch).

    def get_layer_dims(self, layer: str = 'final'
                       ) -> Tuple[int, int, int]:
        """Feature-volume dims (h, w, c) of the forward's `final`
        activation — the darknet `layer_dims` capability
        (models_detection/YOLO.py:136-138)."""
        if layer != 'final':
            raise KeyError(layer)
        h, w = self.net_size
        shapes = jax.eval_shape(
            lambda v, x: self.module.apply(v, x, train=False),
            self.variables, jnp.zeros((1, h, w, 3), jnp.float32))
        return tuple(shapes['final'].shape[1:])

    def forward_batch(self, images, layer: str = 'final',
                      top_k: int = 16):
        """Batched prior-source surface: images (N, H, W, 3) in [0, 1] →
        (feats (N, fh, fw, fc), boxes (N, K, 4) center-format normalized,
        labels (N, K), scores (N, K), valid (N, K)) — one jitted program
        per chunk, like YOLOv2Detector.forward_batch."""
        if layer != 'final':
            raise KeyError(layer)
        fn = self._forward_batch_cache.get(top_k)
        if fn is None:
            specs, net_size = self.specs, self.net_size
            obj, nms = self.obj_threshold, self.nms_threshold

            @jax.jit
            def fn(v, x):
                out = self.module.apply(v, x, train=False)
                dec = jax.vmap(lambda *hs: decode_cfg_outputs(
                    [h[None] for h in hs], net_size, obj, nms,
                    top_k=top_k, specs=specs))(*out['heads'])
                return (out['final'],) + dec
            self._forward_batch_cache[top_k] = fn
        return fn(self.variables, jnp.asarray(images, jnp.float32))

    def detect(self, input_path: str):
        """Image path → [(label, score, (cx, cy, w, h))], image-relative —
        the reference's YOLO.detect surface (YOLO.py:140-162)."""
        import cv2
        h, w = self.net_size
        image = cv2.imread(input_path)
        if image is None:
            raise FileNotFoundError(input_path)
        image = image[:, :, ::-1]
        x = jnp.asarray(cv2.resize(image, (w, h)), jnp.float32)[None] / 255.0
        out = self.forward(x)
        boxes, label_ids, scores, valid = decode_cfg_outputs(
            out['heads'], self.net_size, self.obj_threshold,
            self.nms_threshold, specs=self.specs)
        boxes, label_ids, scores, valid = map(
            np.asarray, (boxes, label_ids, scores, valid))
        dets = [(self.labels[int(l)], float(s), tuple(float(v) for v in b))
                for b, l, s, ok in zip(boxes, label_ids, scores, valid)
                if ok]
        return sorted(dets, key=lambda d: -d[1])

    def predict(self, input_path: str, output_path: Optional[str] = None):
        """detect + optional box overlay (KerasYOLO.py:522-537 surface)."""
        dets = self.detect(input_path)
        if output_path:
            import cv2
            img = cv2.imread(input_path)
            ih, iw = img.shape[:2]
            for label, score, (cx, cy, bw, bh) in dets:
                if not all(np.isfinite(v) for v in (cx, cy, bw, bh)):
                    continue    # garbage box (e.g. exp-decode overflow)
                # clamp to the frame: int() of a huge float overflows
                x0 = int(np.clip((cx - bw / 2) * iw, 0, iw - 1))
                y0 = int(np.clip((cy - bh / 2) * ih, 0, ih - 1))
                x1 = int(np.clip((cx + bw / 2) * iw, 0, iw - 1))
                y1 = int(np.clip((cy + bh / 2) * ih, 0, ih - 1))
                cv2.rectangle(img, (x0, y0), (x1, y1), (0, 255, 0), 2)
                cv2.putText(img, f'{label} {score:.2f}', (x0, max(y0 - 4, 10)),
                            cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 0), 1)
            cv2.imwrite(output_path, img)
        return dets
