"""Programmatic Darknet cfg generators for the registered YOLO zoo.

The reference ships no cfg files (it downloads prebuilt ONNX engines,
scripts/download_models.sh) but its conversion tooling consumes standard
Darknet cfgs (scripts/yolo2onnx.py:1-60). Here the cfg IS the registered
model: each generator emits the exact upstream layer sequence (so released
``.weights`` files load in traversal order through
``darknet.load_darknet_weights``), parameterized by input size, class
count, anchors, and scale_x_y — which is how the CrowdHuman YOLOv4-512
variant differs from the COCO original.

Structural anchors verified against the upstream cfgs: yolov4.cfg routes
``85``/``54`` after the upsamples and ``-16``/``-37`` on the PAN
downsample joins; yolov3.cfg routes ``61``/``36``; yolov4-tiny's
``groups=2 group_id=1`` CSP split with the ``-6,-1`` join; yolov3-tiny's
``route -1, 8`` lateral. These fall out of the generated layer indices —
asserted in tests/test_cfgs.py.
"""
from __future__ import annotations


class _Cfg:
    """Tiny builder that tracks layer indices for assertions."""

    def __init__(self, width, height, channels=3):
        self.lines = [f'[net]\nwidth={width}\nheight={height}\n'
                      f'channels={channels}\n']
        self.n = 0          # number of layers emitted

    def conv(self, filters, size, stride=1, act='mish', bn=1, groups=1):
        s = (f'[convolutional]\n'
             + (f'batch_normalize={bn}\n' if bn else '')
             + f'filters={filters}\nsize={size}\nstride={stride}\npad=1\n'
             + (f'groups={groups}\n' if groups > 1 else '')
             + f'activation={act}\n')
        self.lines.append(s)
        self.n += 1
        return self.n - 1

    def route(self, layers, groups=1, group_id=0):
        s = '[route]\nlayers=' + ','.join(str(l) for l in layers) + '\n'
        if groups > 1:
            s += f'groups={groups}\ngroup_id={group_id}\n'
        self.lines.append(s)
        self.n += 1
        return self.n - 1

    def shortcut(self, frm=-3, act='linear'):
        self.lines.append(f'[shortcut]\nfrom={frm}\nactivation={act}\n')
        self.n += 1
        return self.n - 1

    def maxpool(self, size, stride):
        self.lines.append(f'[maxpool]\nsize={size}\nstride={stride}\n')
        self.n += 1
        return self.n - 1

    def upsample(self, stride=2):
        self.lines.append(f'[upsample]\nstride={stride}\n')
        self.n += 1
        return self.n - 1

    def yolo(self, mask, anchors, classes, scale_x_y=None, new_coords=None):
        s = ('[yolo]\nmask=' + ','.join(str(m) for m in mask)
             + '\nanchors=' + ','.join(str(a) for a in anchors)
             + f'\nclasses={classes}\n')
        if scale_x_y is not None:
            s += f'scale_x_y={scale_x_y}\n'
        if new_coords:
            s += 'new_coords=1\n'
        self.lines.append(s)
        self.n += 1
        return self.n - 1

    def text(self):
        return '\n'.join(self.lines)


def _csp_stage(c, filters, blocks, first=False):
    """CSPDarknet53 stage (yolov4.cfg downsample blocks)."""
    split = filters if first else filters // 2
    hidden = filters // 2
    c.conv(filters, 3, 2)              # downsample
    c.conv(split, 1)                   # split-left
    c.route([-2])
    c.conv(split, 1)                   # split-right
    for _ in range(blocks):
        c.conv(hidden, 1)
        c.conv(split, 3)
        c.shortcut(-3)
    c.conv(split, 1)                   # transition
    c.route([-1, -(3 * blocks + 4)])   # transition + split-left
    return c.conv(filters, 1)          # stage output


def _conv5(c, f, act='leaky'):
    """5-conv neck block 1-3-1-3-1 at width f."""
    c.conv(f, 1, act=act)
    c.conv(f * 2, 3, act=act)
    c.conv(f, 1, act=act)
    c.conv(f * 2, 3, act=act)
    return c.conv(f, 1, act=act)


def yolov4_cfg(num_classes, height, width, anchors, scales):
    """YOLOv4: CSPDarknet53 + SPP + PANet, 3 heads (yolov4.cfg layout).

    ``anchors``: flat 18-element list; masks are 0-2 / 3-5 / 6-8 in head
    order stride 8, 16, 32 (first yolo section = finest level upstream).
    """
    assert len(anchors) == 18 and len(scales) == 3
    no = 3 * (5 + num_classes)
    c = _Cfg(width, height)
    c.conv(32, 3)
    _csp_stage(c, 64, 1, first=True)
    _csp_stage(c, 128, 2)
    p3 = _csp_stage(c, 256, 8)
    p4 = _csp_stage(c, 512, 8)
    _csp_stage(c, 1024, 4)
    assert p3 == 54 and p4 == 85, (p3, p4)   # upstream route anchors

    # SPP
    c.conv(512, 1, act='leaky')
    c.conv(1024, 3, act='leaky')
    c.conv(512, 1, act='leaky')
    c.maxpool(5, 1)
    c.route([-2])
    c.maxpool(9, 1)
    c.route([-4])
    c.maxpool(13, 1)
    c.route([-1, -3, -5, -6])
    c.conv(512, 1, act='leaky')
    c.conv(1024, 3, act='leaky')
    n5 = c.conv(512, 1, act='leaky')
    assert n5 == 116, n5                      # -37 join target upstream

    # top-down to P4
    c.conv(256, 1, act='leaky')
    c.upsample()
    c.route([p4])
    c.conv(256, 1, act='leaky')
    c.route([-1, -3])
    n4 = _conv5(c, 256)
    assert n4 == 126, n4                      # -16 join target upstream

    # top-down to P3
    c.conv(128, 1, act='leaky')
    c.upsample()
    c.route([p3])
    c.conv(128, 1, act='leaky')
    c.route([-1, -3])
    _conv5(c, 128)

    # head 1 (stride 8)
    c.conv(256, 3, act='leaky')
    c.conv(no, 1, act='linear', bn=0)
    c.yolo([0, 1, 2], anchors, num_classes, scales[0])

    # bottom-up to P4
    c.route([-4])
    c.conv(256, 3, 2, act='leaky')
    j4 = c.route([-1, n4])
    assert j4 - n4 == 16, (j4, n4)
    _conv5(c, 256)
    c.conv(512, 3, act='leaky')
    c.conv(no, 1, act='linear', bn=0)
    c.yolo([3, 4, 5], anchors, num_classes, scales[1])

    # bottom-up to P5
    c.route([-4])
    c.conv(512, 3, 2, act='leaky')
    j5 = c.route([-1, n5])
    assert j5 - n5 == 37, (j5, n5)
    _conv5(c, 512)
    c.conv(1024, 3, act='leaky')
    c.conv(no, 1, act='linear', bn=0)
    c.yolo([6, 7, 8], anchors, num_classes, scales[2])
    return c.text()


def yolov3_cfg(num_classes, height, width, anchors, spp=False):
    """YOLOv3 (+SPP): Darknet53 + FPN neck, heads stride 32, 16, 8
    (yolov3.cfg / yolov3-spp.cfg layout)."""
    assert len(anchors) == 18
    no = 3 * (5 + num_classes)
    c = _Cfg(width, height)

    def dn_stage(filters, blocks):
        c.conv(filters, 3, 2, act='leaky')
        for _ in range(blocks):
            c.conv(filters // 2, 1, act='leaky')
            c.conv(filters, 3, act='leaky')
            c.shortcut(-3)
        return c.n - 1

    c.conv(32, 3, act='leaky')
    dn_stage(64, 1)
    dn_stage(128, 2)
    p3 = dn_stage(256, 8)
    p4 = dn_stage(512, 8)
    dn_stage(1024, 4)
    assert p3 == 36 and p4 == 61, (p3, p4)   # upstream route anchors

    c.conv(512, 1, act='leaky')
    c.conv(1024, 3, act='leaky')
    c.conv(512, 1, act='leaky')
    if spp:
        c.maxpool(5, 1)
        c.route([-2])
        c.maxpool(9, 1)
        c.route([-4])
        c.maxpool(13, 1)
        c.route([-1, -3, -5, -6])
        c.conv(512, 1, act='leaky')
    c.conv(1024, 3, act='leaky')
    c.conv(512, 1, act='leaky')
    c.conv(1024, 3, act='leaky')
    c.conv(no, 1, act='linear', bn=0)
    c.yolo([6, 7, 8], anchors, num_classes)

    c.route([-4])
    c.conv(256, 1, act='leaky')
    c.upsample()
    c.route([-1, p4])
    _conv5(c, 256)
    c.conv(512, 3, act='leaky')
    c.conv(no, 1, act='linear', bn=0)
    c.yolo([3, 4, 5], anchors, num_classes)

    c.route([-4])
    c.conv(128, 1, act='leaky')
    c.upsample()
    c.route([-1, p3])
    _conv5(c, 128)
    c.conv(256, 3, act='leaky')
    c.conv(no, 1, act='linear', bn=0)
    c.yolo([0, 1, 2], anchors, num_classes)
    return c.text()


def yolov4_tiny_cfg(num_classes, height, width, anchors, scales):
    """YOLOv4-tiny: CSP-tiny backbone, 2 heads (yolov4-tiny.cfg layout).

    Upstream quirk preserved: the second yolo's mask is ``1,2,3`` — the
    (81, 82) anchor pair appears in BOTH heads (zoo constants
    yolo.py:270-278 of the reference encode exactly this overlap).
    """
    assert len(anchors) == 12 and len(scales) == 2
    no = 3 * (5 + num_classes)
    c = _Cfg(width, height)
    c.conv(32, 3, 2, act='leaky')
    c.conv(64, 3, 2, act='leaky')

    def tiny_block(filters):
        c.conv(filters, 3, act='leaky')
        c.route([-1], groups=2, group_id=1)
        c.conv(filters // 2, 3, act='leaky')
        c.conv(filters // 2, 3, act='leaky')
        c.route([-1, -2])
        out = c.conv(filters, 1, act='leaky')
        c.route([-6, -1])
        c.maxpool(2, 2)
        return out

    tiny_block(64)
    tiny_block(128)
    lat = tiny_block(256)
    assert lat == 23, lat                     # 'route 23' lateral upstream
    c.conv(512, 3, act='leaky')
    n5 = c.conv(256, 1, act='leaky')
    c.conv(512, 3, act='leaky')
    c.conv(no, 1, act='linear', bn=0)
    c.yolo([3, 4, 5], anchors, num_classes, scales[0])
    c.route([n5])
    c.conv(128, 1, act='leaky')
    c.upsample()
    c.route([-1, lat])
    c.conv(256, 3, act='leaky')
    c.conv(no, 1, act='linear', bn=0)
    c.yolo([1, 2, 3], anchors, num_classes, scales[1])
    return c.text()


def yolov3_tiny_cfg(num_classes, height, width, anchors):
    """YOLOv3-tiny (yolov3-tiny.cfg layout)."""
    assert len(anchors) == 12
    no = 3 * (5 + num_classes)
    c = _Cfg(width, height)
    c.conv(16, 3, act='leaky')
    c.maxpool(2, 2)
    c.conv(32, 3, act='leaky')
    c.maxpool(2, 2)
    c.conv(64, 3, act='leaky')
    c.maxpool(2, 2)
    c.conv(128, 3, act='leaky')
    c.maxpool(2, 2)
    lat = c.conv(256, 3, act='leaky')
    assert lat == 8, lat                      # 'route 8' lateral upstream
    c.maxpool(2, 2)
    c.conv(512, 3, act='leaky')
    c.maxpool(2, 1)
    c.conv(1024, 3, act='leaky')
    n5 = c.conv(256, 1, act='leaky')
    c.conv(512, 3, act='leaky')
    c.conv(no, 1, act='linear', bn=0)
    c.yolo([3, 4, 5], anchors, num_classes)
    c.route([n5])
    c.conv(128, 1, act='leaky')
    c.upsample()
    c.route([-1, lat])
    c.conv(256, 3, act='leaky')
    c.conv(no, 1, act='linear', bn=0)
    c.yolo([0, 1, 2], anchors, num_classes)
    return c.text()


# ---------------------------------------------------------------------------
# Scaled-YOLOv4 family (yolov4-csp / x-mish / csp-swish / csp-x-swish /
# p5 / p6). Layer sequences follow the AlexeyAB darknet ports of
# Scaled-YOLOv4 (CVPR 2021): fully CSP-ized backbone AND neck, single
# activation throughout, logistic head convs with new_coords=1 and
# scale_x_y=2.0 (reference registrations yolo.py:171-299). Reconstruction
# notes: stage residuals / CSP splits / SPP placement mirror yolov4.cfg's
# conventions with the csp-set neck; if a layout detail diverges from a
# particular upstream cfg revision, `darknet.yolo_from_cfg` runs the
# verbatim upstream cfg + weights with no code changes (the interpreter
# is cfg-generic), so pretrained use is never blocked on these
# generators.
# ---------------------------------------------------------------------------

def _csp_stage_scaled(c, filters, blocks, act, plain=False):
    """Scaled-family backbone stage: strided conv + (plain residual |
    cross-stage-partial residual group at half width)."""
    c.conv(filters, 3, 2, act=act)
    if plain:
        c.conv(filters // 2, 1, act=act)
        c.conv(filters, 3, act=act)
        return c.shortcut(-3)
    c.conv(filters // 2, 1, act=act)       # split-left
    c.route([-2])
    c.conv(filters // 2, 1, act=act)       # split-right
    for _ in range(blocks):
        c.conv(filters // 2, 1, act=act)
        c.conv(filters // 2, 3, act=act)
        c.shortcut(-3)
    c.conv(filters // 2, 1, act=act)       # transition
    c.route([-1, -(3 * blocks + 4)])
    return c.conv(filters, 1, act=act)


def _csp_spp(c, f, act):
    """CSP-ized SPP block on the top pyramid level."""
    c.conv(f, 1, act=act)                  # split-left (the -13 target)
    c.route([-2])
    c.conv(f, 1, act=act)
    c.conv(f, 3, act=act)
    c.conv(f, 1, act=act)
    c.maxpool(5, 1)
    c.route([-2])
    c.maxpool(9, 1)
    c.route([-4])
    c.maxpool(13, 1)
    c.route([-1, -3, -5, -6])
    c.conv(f, 1, act=act)
    c.conv(f, 3, act=act)
    c.route([-1, -13])
    return c.conv(f, 1, act=act)


def _csp_convset(c, f, act, pairs=2):
    """CSP-ized neck conv set (role of BottleneckCSP2 in the
    Scaled-YOLOv4 yamls): ``pairs`` 1x1+3x3 repetitions inside the
    split — 2 for yolov4-csp, 3 for the depth-scaled x / P5 / P6
    models (the paper's 52.9M / 70.8M / 127.6M parameter counts
    reproduce only with this depth split)."""
    c.conv(f, 1, act=act)                  # split-left
    c.route([-2])
    c.conv(f, 1, act=act)
    for _ in range(pairs - 1):
        c.conv(f, 3, act=act)
        c.conv(f, 1, act=act)
    c.conv(f, 3, act=act)
    c.route([-1, -(2 * pairs + 2)])
    return c.conv(f, 1, act=act)


def scaled_yolov4_cfg(num_classes, height, width, anchors, n_heads,
                      widths, depths, act='mish', stem=32,
                      first_plain=True, scale_x_y=2.0, neck_pairs=2):
    """Scaled-YOLOv4 cfg: ``widths``/``depths`` give the backbone stages
    (strides 2..2^len); the last ``n_heads`` stages feed the CSP-PAN.
    ``anchors`` is the flat per-head concatenation (duplicates allowed,
    exactly like upstream yolov4-p6.cfg's 16-pair table); masks are
    consecutive ranges."""
    pairs_total = len(anchors) // 2
    assert pairs_total % n_heads == 0, (pairs_total, n_heads)
    pairs = pairs_total // n_heads
    no = pairs * (5 + num_classes)
    c = _Cfg(width, height)
    c.conv(stem, 3, act=act)
    stage_outs = []
    for i, (f, d) in enumerate(zip(widths, depths)):
        stage_outs.append(
            _csp_stage_scaled(c, f, d, act, plain=(i == 0 and first_plain)))

    pyr = stage_outs[-n_heads:]
    neck_w = [widths[len(widths) - n_heads + k] // 2 for k in range(n_heads)]

    n_top = _csp_spp(c, neck_w[-1], act)
    necks = [n_top]                        # coarse -> fine
    for lvl in range(n_heads - 2, -1, -1):
        f = neck_w[lvl]
        c.conv(f, 1, act=act)
        c.upsample()
        c.route([pyr[lvl]])
        c.conv(f, 1, act=act)
        c.route([-1, -3])
        necks.append(_csp_convset(c, f, act, neck_pairs))
    necks = necks[::-1]                    # fine -> coarse

    for k in range(n_heads):
        if k > 0:                          # bottom-up join
            c.route([-4])
            c.conv(neck_w[k], 3, 2, act=act)
            c.route([-1, necks[k]])
            _csp_convset(c, neck_w[k], act, neck_pairs)
        c.conv(neck_w[k] * 2, 3, act=act)
        c.conv(no, 1, act='logistic', bn=0)
        c.yolo(list(range(k * pairs, (k + 1) * pairs)), anchors,
               num_classes, scale_x_y, new_coords=1)
    return c.text()
