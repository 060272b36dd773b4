import numpy as np

from emrt_tpu.utils.metrics import (MetricAccumulator, accuracy,
                                    calculate_area, kappa, mean_iou)


def _np_areas(pred, label, num_classes, ignore_index=255):
    """Straightforward numpy reference for confusion areas."""
    mask = label != ignore_index
    intersect = np.zeros(num_classes)
    pred_area = np.zeros(num_classes)
    label_area = np.zeros(num_classes)
    for c in range(num_classes):
        p = (pred == c) & mask
        l = (label == c) & mask
        intersect[c] = np.sum(p & l)
        pred_area[c] = np.sum(p)
        label_area[c] = np.sum(l)
    return intersect, pred_area, label_area


def test_calculate_area_matches_numpy():
    rng = np.random.default_rng(0)
    pred = rng.integers(0, 6, (2, 64, 64)).astype(np.int32)
    label = rng.integers(0, 6, (2, 64, 64)).astype(np.int32)
    label[0, :8] = 255  # ignore region
    i, p, l = calculate_area(pred, label, 6, 255)
    ri, rp, rl = _np_areas(pred, label, 6)
    np.testing.assert_array_equal(np.asarray(i), ri)
    np.testing.assert_array_equal(np.asarray(p), rp)
    np.testing.assert_array_equal(np.asarray(l), rl)


def test_known_confusion():
    # 2 classes; pred = [0,0,1,1], label = [0,1,1,1]
    pred = np.array([[0, 0, 1, 1]])
    label = np.array([[0, 1, 1, 1]])
    i, p, l = calculate_area(pred, label, 2, 255)
    class_iou, miou = mean_iou(i, p, l)
    # class0: i=1, union=1+2-1=2 -> 0.5 ; class1: i=2, union=2+3-2=3 -> 2/3
    np.testing.assert_allclose(class_iou, [0.5, 2 / 3])
    np.testing.assert_allclose(miou, (0.5 + 2 / 3) / 2)
    acc, prec, rec = accuracy(i, p, l)
    np.testing.assert_allclose(acc, 3 / 4)
    np.testing.assert_allclose(prec, [1 / 2, 2 / 2])
    np.testing.assert_allclose(rec, [1 / 1, 2 / 3])
    k = kappa(i, p, l)
    po = 3 / 4
    pe = (2 * 1 + 2 * 3) / 16
    np.testing.assert_allclose(k, (po - pe) / (1 - pe))


def test_accumulator_streaming():
    rng = np.random.default_rng(1)
    acc1 = MetricAccumulator(4)
    all_pred, all_label = [], []
    for _ in range(3):
        pred = rng.integers(0, 4, (32, 32)).astype(np.int32)
        label = rng.integers(0, 4, (32, 32)).astype(np.int32)
        acc1.update(pred, label)
        all_pred.append(pred)
        all_label.append(label)
    acc2 = MetricAccumulator(4)
    acc2.update(np.stack(all_pred), np.stack(all_label))
    np.testing.assert_array_equal(acc1.intersect, acc2.intersect)
    assert acc1.summarize()["miou"] == acc2.summarize()["miou"]


def test_out_of_range_labels_dropped():
    # negative or >= C labels must be excluded, not clipped into bin 0
    # (guards against remap bugs like LoveDA raw-0 -> -1)
    pred = np.array([0, 1, 0, 1, 0], np.int32)
    label = np.array([0, 1, -1, 7, 255], np.int32)
    i, p, l = calculate_area(pred, label, 2, 255)
    np.testing.assert_array_equal(np.asarray(i), [1, 1])
    np.testing.assert_array_equal(np.asarray(p), [1, 1])
    np.testing.assert_array_equal(np.asarray(l), [1, 1])


def test_loveda_val_remap_ignores_zero():
    from emrt_tpu.data.datasets import LoveDA
    ds = object.__new__(LoveDA)  # no disk access needed for the remap
    raw = np.array([[0, 1, 2, 7]], np.int32)  # 0 = ignore, 1..7 = classes
    out = ds._remap_val_label(raw.copy())
    np.testing.assert_array_equal(out, [[255, 0, 1, 6]])
    out_train = ds._remap_train_label(raw.copy())
    np.testing.assert_array_equal(out_train, [[255, 0, 1, 6]])
