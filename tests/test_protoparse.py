"""Wire-format protobuf reader tests: hand-encoded ONNX ModelProto and
TF GraphDef fixtures (no onnx/tensorflow packages in this env — the
encoders below build the exact bytes those libraries would)."""
import numpy as np
import pytest

from fastmot_tpu.models.protoparse import (graphdef_constants,
                                           onnx_initializers)


# --- tiny protobuf encoder -------------------------------------------------

def _varint(v):
    if v < 0:
        v += 1 << 64
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _tag(field, wt):
    return _varint((field << 3) | wt)


def f_varint(field, v):
    return _tag(field, 0) + _varint(v)


def f_bytes(field, data):
    return _tag(field, 2) + _varint(len(data)) + data


def f_str(field, s):
    return f_bytes(field, s.encode())


def f_packed_i64(field, vals):
    return f_bytes(field, b''.join(_varint(v) for v in vals))


# --- ONNX fixtures ---------------------------------------------------------

def onnx_tensor(name, arr, raw=True):
    dt = {np.dtype(np.float32): 1, np.dtype(np.int64): 7,
          np.dtype(np.float16): 10, np.dtype(np.int8): 3}[arr.dtype]
    msg = f_packed_i64(1, list(arr.shape)) + f_varint(2, dt) + f_str(8, name)
    if raw:
        msg += f_bytes(9, arr.tobytes())
    elif arr.dtype == np.float32:
        msg += f_bytes(4, arr.tobytes())          # packed float_data
    elif arr.dtype == np.int64:
        msg += b''.join(f_varint(7, int(v)) for v in arr.ravel())
    return msg


def onnx_model(tensors):
    graph = b''.join(f_bytes(5, t) for t in tensors)
    return f_varint(1, 8) + f_bytes(7, graph)     # ir_version + graph


def test_onnx_raw_and_typed_data():
    w = np.arange(24, dtype=np.float32).reshape(2, 3, 4) * 0.5
    b = np.array([-3, 7, 1 << 40], np.int64)
    h = np.arange(4, dtype=np.float16)
    data = onnx_model([
        onnx_tensor('conv_weights', w),
        onnx_tensor('shape', b, raw=False),
        onnx_tensor('half', h),
        onnx_tensor('floats_typed', w[0], raw=False),
    ])
    out = onnx_initializers(data)
    assert set(out) == {'conv_weights', 'shape', 'half', 'floats_typed'}
    np.testing.assert_array_equal(out['conv_weights'], w)
    np.testing.assert_array_equal(out['shape'], b)
    np.testing.assert_array_equal(out['half'], h)
    np.testing.assert_array_equal(out['floats_typed'], w[0])


def test_onnx_negative_dims_and_empty():
    with pytest.raises(ValueError):
        onnx_initializers(f_varint(1, 8))         # no graph


# --- GraphDef fixtures -----------------------------------------------------

def tf_tensor(arr, content=True, splat=False):
    """Encode a TF TensorProto with tensorflow's REAL field numbers
    (tensor.proto: dtype=1 shape=2 tensor_content=4 float_val=5
    double_val=6 int_val=7 string_val=8 int64_val=10 bool_val=11
    half_val=13) — fixture bytes match what tensorflow's
    make_tensor_proto serializes."""
    dt = {np.dtype(np.float32): 1, np.dtype(np.int32): 3,
          np.dtype(np.float64): 2, np.dtype(np.float16): 19,
          np.dtype(np.int64): 9, np.dtype(np.bool_): 10}[arr.dtype]
    dims = b''.join(f_bytes(2, f_varint(1, d)) for d in arr.shape)
    msg = f_varint(1, dt) + f_bytes(2, dims)
    if splat:
        msg += f_bytes(5, arr.ravel()[:1].tobytes())  # single float_val
    elif content:
        msg += f_bytes(4, arr.tobytes())
    elif arr.dtype == np.float32:
        msg += f_bytes(5, arr.tobytes())          # packed float_val
    elif arr.dtype == np.float64:
        msg += f_bytes(6, arr.tobytes())          # packed double_val
    elif arr.dtype == np.float16:
        # half_val: raw float16 bit patterns as packed varints
        msg += f_packed_i64(13, [int(v) for v in
                                 arr.ravel().view(np.uint16)])
    elif arr.dtype == np.int64:
        msg += f_packed_i64(10, [int(v) for v in arr.ravel()])
    elif arr.dtype == np.bool_:
        msg += f_packed_i64(11, [int(v) for v in arr.ravel()])
    else:
        msg += b''.join(f_varint(7, int(v)) for v in arr.ravel())
    return msg


def tf_node(name, op, tensor=None):
    msg = f_str(1, name) + f_str(2, op)
    if tensor is not None:
        attr_value = f_bytes(8, tensor)
        entry = f_str(1, 'value') + f_bytes(2, attr_value)
        msg += f_bytes(5, entry)
    return msg


def graphdef(nodes):
    return b''.join(f_bytes(1, n) for n in nodes)


def test_graphdef_constants():
    w = np.linspace(-1, 1, 36, dtype=np.float32).reshape(3, 3, 2, 2)
    idx = np.array([[1, 2], [3, 4]], np.int32)
    ones = np.ones((5,), np.float32)
    data = graphdef([
        tf_node('FeatureExtractor/MobilenetV1/Conv2d_0/weights', 'Const',
                tf_tensor(w)),
        tf_node('strides', 'Const', tf_tensor(idx, content=False)),
        tf_node('BatchNorm/gamma', 'Const', tf_tensor(ones, splat=True)),
        tf_node('Relu6', 'Relu6'),                # non-const node skipped
    ])
    out = graphdef_constants(data)
    assert set(out) == {'FeatureExtractor/MobilenetV1/Conv2d_0/weights',
                        'strides', 'BatchNorm/gamma'}
    np.testing.assert_array_equal(
        out['FeatureExtractor/MobilenetV1/Conv2d_0/weights'], w)
    np.testing.assert_array_equal(out['strides'], idx)
    np.testing.assert_array_equal(out['BatchNorm/gamma'], ones)


def test_graphdef_typed_value_fields():
    """Scalar/small consts live in the typed *_val fields on real frozen
    graphs. The negative scalar float is the adversarial case: its packed
    float_val bytes end with a byte that has the varint continuation bit
    set (-1.0f = 00 00 80 BF), which crashed a reader using the wrong
    field map."""
    neg = np.array([-1.0], np.float32)            # bytes 00 00 80 BF
    negs = np.array([-0.5, -2.75, 3.5], np.float32)
    dbl = np.array([1e-8, -4.0], np.float64)
    i64 = np.array([-3, 1 << 40], np.int64)
    flags = np.array([True, False, True], np.bool_)
    halves = np.array([1.0, -2.5, 0.0], np.float16)
    data = graphdef([
        tf_node('neg_scalar', 'Const', tf_tensor(neg, content=False)),
        tf_node('neg_vec', 'Const', tf_tensor(negs, content=False)),
        tf_node('eps', 'Const', tf_tensor(dbl, content=False)),
        tf_node('span', 'Const', tf_tensor(i64, content=False)),
        tf_node('mask', 'Const', tf_tensor(flags, content=False)),
        tf_node('half', 'Const', tf_tensor(halves, content=False)),
    ])
    out = graphdef_constants(data)
    assert set(out) == {'neg_scalar', 'neg_vec', 'eps', 'span', 'mask',
                        'half'}
    np.testing.assert_array_equal(out['neg_scalar'], neg)
    np.testing.assert_array_equal(out['neg_vec'], negs)
    np.testing.assert_array_equal(out['eps'], dbl)
    np.testing.assert_array_equal(out['span'], i64)
    np.testing.assert_array_equal(out['mask'], flags)
    np.testing.assert_array_equal(out['half'], halves)


def test_graphdef_string_const_skipped():
    """string_val (field 8) consts decode to nothing numeric and must be
    skipped, not crash the whole constant sweep."""
    msg = f_varint(1, 7) + f_bytes(2, b'') + f_bytes(8, b'some_label')
    w = np.ones((2,), np.float32)
    data = graphdef([
        tf_node('labels', 'Const', msg),
        tf_node('w', 'Const', tf_tensor(w)),
    ])
    out = graphdef_constants(data)
    assert 'w' in out
    np.testing.assert_array_equal(out['w'], w)


def test_onnx_fp16_typed_bitcast():
    """ONNX int32_data for float16 carries raw uint16 bit patterns —
    1.0 is stored as 15360, and must decode back to 1.0, not 15360.0."""
    h = np.array([1.0, -2.5, 0.5], np.float16)
    bits = h.view(np.uint16)
    msg = (f_packed_i64(1, [3]) + f_varint(2, 10) + f_str(8, 'half_typed')
           + b''.join(f_varint(5, int(b)) for b in bits))
    out = onnx_initializers(onnx_model([msg]))
    np.testing.assert_array_equal(out['half_typed'], h)


def test_truncated_varint_raises_valueerror():
    """A truncated varint must raise ValueError (tolerated per-node by
    graphdef_constants), never IndexError."""
    from fastmot_tpu.models.protoparse import _read_varint
    with pytest.raises(ValueError):
        _read_varint(memoryview(b'\x80\x80'), 0)
