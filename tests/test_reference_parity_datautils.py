"""Dataset-utils parity against the reference's OWN muvo/data/dataset_utils
(importable with the carla stub; the tested functions are pure
numpy/torch). These functions define the stored-data semantics: bit-packed
voxels, birdview label priority, the 15->9-channel birdview compression,
route-command remapping. (reference: muvo/data/dataset_utils.py:10-135)
"""

import numpy as np
import torch

from reference_stubs import install as _install_reference_stubs

_install_reference_stubs()

from muvo.data import dataset_utils as ref_du  # noqa: E402

from muvo_tpu.data import dataset_utils as du  # noqa: E402

rng = np.random.RandomState(61)


def test_bit_packing_roundtrip_matches_reference():
    # the reference's packing helpers are pure numpy (dataset_utils.py:10-35)
    n_bits = 12
    bits = (rng.rand(35, n_bits) > 0.5).astype(np.float32)
    ours = du.binary_to_integer(bits, n_bits)
    ref = ref_du.binary_to_integer(bits, n_bits)
    np.testing.assert_array_equal(np.asarray(ours), ref)

    ints = rng.randint(0, 2 ** n_bits, (35,)).astype(np.int32)
    ours_b = du.integer_to_binary(ints, n_bits)
    ref_b = ref_du.integer_to_binary(ints, n_bits)
    np.testing.assert_array_equal(np.asarray(ours_b, np.float32),
                                  np.asarray(ref_b, np.float32))


def test_birdview_labels_match_reference():
    n_classes = 15
    bv = (rng.rand(n_classes, 16, 16) > 0.7).astype(np.float32)
    ours = du.calculate_birdview_labels(bv, n_classes)
    ref = ref_du.calculate_birdview_labels(torch.from_numpy(bv),
                                           n_classes).numpy()
    np.testing.assert_array_equal(np.asarray(ours), ref)
    # time-dimension variant
    bvt = (rng.rand(3, n_classes, 8, 8) > 0.7).astype(np.float32)
    ours_t = du.calculate_birdview_labels(bvt, n_classes,
                                          has_time_dimension=True)
    ref_t = ref_du.calculate_birdview_labels(torch.from_numpy(bvt), n_classes,
                                             has_time_dimension=True).numpy()
    np.testing.assert_array_equal(np.asarray(ours_t), ref_t)


def test_birdview_routemap_compression_matches_reference():
    # raw 15-channel birdview in {0, 255}, light channel in {0,80,170,255}
    bv = (rng.rand(15, 24, 24) > 0.8).astype(np.float32) * 255.0
    bv[-1] = rng.choice([0, 80, 170, 255], (24, 24)).astype(np.float32)
    ours_bv, ours_rm = du.preprocess_birdview_and_routemap(bv.copy())
    ref_bv, ref_rm = ref_du.preprocess_birdview_and_routemap(
        torch.from_numpy(bv.copy()))
    np.testing.assert_allclose(np.asarray(ours_bv), ref_bv.numpy())
    np.testing.assert_array_equal(np.asarray(ours_rm), ref_rm.numpy())


def test_instance_mask_matches_reference():
    sem = rng.randint(0, 12, (20, 20)).astype(np.uint8)
    ours = du.calculate_instance_mask(sem, 4, 10)
    ref = ref_du.calculate_instance_mask(sem, 4, 10)
    for k in ref:
        np.testing.assert_array_equal(np.asarray(ours[k]), np.asarray(ref[k]))


def test_route_command_remap_matches_reference():
    # the carla-free half of preprocess_measurements: route command remap
    for raw in ([-1.0], [1.0], [4.0], [6.0]):
        rc = np.array(raw, np.float32)
        got = du.preprocess_measurements(
            rc.copy(), np.zeros(3), np.zeros(3), np.zeros(7))[0]
        want = rc.copy()
        want[want < 0] = 4
        want -= 1
        assert int(got) == int(want[0])
