"""VideoIO tests: protocol dispatch, capture thread semantics, and the
native framepipe fast path."""
import numpy as np
import cv2
import pytest

from fastmot_tpu.videoio import Protocol, VideoIO, _parse_uri


def test_parse_uri():
    assert _parse_uri('csi://0') == Protocol.CSI
    assert _parse_uri('rtsp://cam/stream') == Protocol.RTSP
    assert _parse_uri('http://host/mjpeg') == Protocol.HTTP
    assert _parse_uri('/dev/video0') == Protocol.V4L2
    assert _parse_uri('%06d.jpg') == Protocol.IMAGE
    assert _parse_uri('img_000.png') == Protocol.IMAGE
    assert _parse_uri('video.mp4') == Protocol.VIDEO


@pytest.fixture
def jpeg_seq(tmp_path, rng):
    for i in range(1, 9):
        img = rng.integers(0, 255, (120, 160, 3), dtype=np.uint8)
        img[:16, :16] = i * 30  # frame marker block (JPEG-robust)
        cv2.imwrite(str(tmp_path / f'{i:06d}.jpg'),
                    img, [cv2.IMWRITE_JPEG_QUALITY, 100])
    return str(tmp_path / '%06d.jpg')


def test_image_sequence_read_all(jpeg_seq):
    v = VideoIO((160, 120), jpeg_seq)
    v.start_capture()
    frames = []
    while True:
        f = v.read()
        if f is None:
            break
        frames.append(f)
    v.release()
    assert len(frames) == 8
    # frames arrive in order (marker block mean increases by ~30/frame)
    markers = [float(f[:16, :16].mean()) for f in frames]
    assert all(b - a > 15 for a, b in zip(markers, markers[1:])), markers


def test_image_sequence_resize(jpeg_seq):
    v = VideoIO((80, 60), jpeg_seq)
    v.start_capture()
    f = v.read()
    assert f.shape == (60, 80, 3)
    v.release()


def test_bad_uri_raises():
    with pytest.raises(RuntimeError):
        VideoIO((160, 120), '/tmp/definitely_missing_video.mp4')


def test_framepipe_matches_cv2(jpeg_seq, tmp_path):
    from fastmot_tpu.utils.framepipe import FramePipe
    if not FramePipe.available():
        pytest.skip('libframepipe.so not built')
    fp = FramePipe(jpeg_seq, (160, 120), n_threads=2)
    got = []
    while True:
        f = fp.read()
        if f is None:
            break
        got.append(f)
    fp.close()
    assert len(got) == 8
    ref = cv2.imread(str(tmp_path / '000003.jpg'))
    np.testing.assert_array_equal(got[2], ref)


def test_gst_write_pipeline_string():
    """Software-H.264 analog of the reference's hardware-encode write
    pipeline (reference videoio.py:214-238): x264 zerolatency, container
    mux chosen by extension, filesink at the output URI."""
    from fastmot_tpu.videoio import _gst_write_pipeline

    p = _gst_write_pipeline('/tmp/out.mp4', 30.0)
    assert p.startswith('appsrc ! ')
    assert 'x264enc tune=zerolatency' in p
    assert 'mp4mux' in p
    assert p.endswith('filesink location=/tmp/out.mp4')

    p = _gst_write_pipeline('/tmp/out.mkv', 30.0)
    assert 'matroskamux' in p


def test_writer_fallback_mp4v(jpeg_seq, tmp_path):
    """Writer must open regardless of GStreamer availability (GStreamer
    pipeline when built in, mp4v otherwise) and produce a playable file."""
    out = str(tmp_path / 'out.mp4')
    v = VideoIO((160, 120), jpeg_seq, output_uri=out)
    v.start_capture()
    for _ in range(3):
        f = v.read()
        v.write(f)
    v.release()
    rd = cv2.VideoCapture(out)
    ok, frame = rd.read()
    rd.release()
    assert ok and frame.shape == (120, 160, 3)
