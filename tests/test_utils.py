"""IoU metric values, mirroring the reference's tests/test_utils.py."""
import numpy as np

from drtvam_tpu.utils.metrics import iou


def test_iou():
    target = np.array([1, 1, 0, 0], np.float32).reshape(2, 2)

    assert iou(np.ones((2, 2)), target) == 0.5
    assert iou(np.zeros((2, 2)), target) == 0.0
    assert iou(np.array([[1, 0], [0, 0]]), target) == 0.5
    assert iou(np.array([[1, 1], [1, 0]]), target) == 2 / 3
    assert iou(np.array([[0.6, 0.6], [0.6, 0]]), target) == 0.0
    assert iou(np.array([[0.6, 0.6], [0.6, 0]]), target,
               threshold=0.5) == 2 / 3
