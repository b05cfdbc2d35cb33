"""Generate SimpleITK golden fixtures for the resampler parity tests.

Run this in ANY environment with SimpleITK installed (it is deliberately not
a dependency of cmrtpu — the framework replaces it):

    python tools/gen_itk_goldens.py

It writes ``tests/fixtures/itk_goldens.npz`` with input arrays plus
``sitk.ResampleImageFilter`` outputs at awkward spacings (1.37->1.2 mm, odd
sizes, up- and down-sampling, linear + nearest), configured exactly like the
reference (ref: src/data/Preprocess.py:182-227: output direction/origin =
input's, default value 0). ``tests/test_resample.py::TestItkGoldens`` picks
the file up automatically and pins cmrtpu.ops.resample against it; without
the file those tests skip and parity rests on the hand-derived unit tests
and the scipy cross-implementation checks.

Inputs are seeded, so regenerated goldens are reproducible.
"""

import os

import numpy as np

CASES = [
    # name, shape (z,y,x), in_spacing xyz, out_spacing xyz, interp ('lin'|'nn')
    ("lin_137_to_12", (9, 21, 17), (1.37, 1.37, 8.0), (1.2, 1.2, 8.0), "lin"),
    ("lin_downsample", (5, 32, 28), (1.0, 1.0, 6.0), (1.8, 1.8, 6.0), "lin"),
    ("nn_137_to_12", (9, 21, 17), (1.37, 1.37, 8.0), (1.2, 1.2, 8.0), "nn"),
    ("nn_odd", (7, 19, 23), (0.9, 1.1, 5.0), (1.3, 0.7, 5.0), "nn"),
    ("lin_z_resample", (12, 16, 16), (1.25, 1.25, 5.0), (1.25, 1.25, 3.1), "lin"),
]


def calc_resampled_size(in_size_xyz, in_spacing_xyz, out_spacing_xyz):
    # ref: src/data/Preprocess.py:123-134
    return [int(round(s * sp / osp)) for s, sp, osp in
            zip(in_size_xyz, in_spacing_xyz, out_spacing_xyz)]


def main():
    import SimpleITK as sitk

    rng = np.random.default_rng(20260816)
    out = {}
    for name, shape, in_sp, out_sp, interp in CASES:
        if interp == "nn":
            arr = rng.integers(0, 4, size=shape).astype(np.uint8)
        else:
            arr = rng.normal(100.0, 40.0, size=shape).astype(np.float32)
        img = sitk.GetImageFromArray(arr)
        img.SetSpacing(tuple(float(s) for s in in_sp))

        size = calc_resampled_size(img.GetSize(), in_sp, out_sp)
        resampler = sitk.ResampleImageFilter()
        resampler.SetSize([int(s) for s in size])
        resampler.SetOutputSpacing(tuple(float(s) for s in out_sp))
        resampler.SetOutputDirection(img.GetDirection())
        resampler.SetOutputOrigin(img.GetOrigin())
        resampler.SetInterpolator(sitk.sitkLinear if interp == "lin"
                                  else sitk.sitkNearestNeighbor)
        resampler.SetDefaultPixelValue(0)
        golden = sitk.GetArrayFromImage(resampler.Execute(img))

        out[f"{name}__input"] = arr
        out[f"{name}__golden"] = golden
        out[f"{name}__in_spacing"] = np.asarray(in_sp)
        out[f"{name}__out_spacing"] = np.asarray(out_sp)
        out[f"{name}__interp"] = np.asarray(1 if interp == "nn" else 2)

    dest = os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures",
                        "itk_goldens.npz")
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    np.savez_compressed(dest, **out)
    print(f"wrote {len(CASES)} golden cases to {dest}")


if __name__ == "__main__":
    main()
