"""Generate docs/PARITY.md — reference-symbol → cmrtpu cross-walk.

Enumerates every public top-level def/class in the reference tree and maps
it to its cmrtpu equivalent: mechanically when the same name is DEFINED in a
cmrtpu module (re-derivations keep reference names as their public
contract), and via the hand-curated MANUAL table for renames, redesigns and
reference dead code. Run from the repo root:

    python tools/gen_parity.py [--ref /root/reference]
"""

import argparse
import collections
import os
import re

# verified-by-hand equivalents for symbols whose cmrtpu counterpart is
# renamed, redesigned, or whose reference original is dead code
MANUAL = {
    "DownSampleBlock": ("cmrtpu/models/unet.py::DownBlock",
                        "redesigned (flax module, conv-drop-conv + maxpool)"),
    "UpSampleBlock": ("cmrtpu/models/unet.py::UpBlock",
                      "redesigned (flax module, upsample/transpose-conv + "
                      "skip concat)"),
    "downsampling_block_fn": ("cmrtpu/models/unet.py::DownBlock",
                              "reference keeps class + functional twins of "
                              "the same math; one flax module covers both"),
    "upsampling_block_fn": ("cmrtpu/models/unet.py::UpBlock",
                            "same-math functional twin of UpSampleBlock"),
    "encoder_fn": ("cmrtpu/models/unet.py::ConvEncoder",
                   "same-math functional twin of ConvEncoder"),
    "inverse_affine_matrix_fn": (
        "cmrtpu/models/layers.py::affine_matrix_inverter",
        "renamed (numpy twin of invert_affine_matrix)"),
    "get_diffs": ("cmrtpu/eval/landmarks.py::get_differences",
                  "reference DEAD CODE (defined, never called); live "
                  "semantics covered"),
    "weighted_cce_dice_coef": (
        "cmrtpu/train/losses.py::weighted_cce_dice_loss",
        "renamed (it is a loss factory, not a coefficient)"),
    "create_unet_layer": ("cmrtpu/models/hybrids.py::get_model",
                          "reference ships 3 build styles (functional/layer/"
                          "subclass) of ONE network; a single flax UNet + "
                          "MODEL_VARIANT dispatcher covers them"),
    "create_unet_class": ("cmrtpu/models/hybrids.py::get_model",
                          "same network, subclass build style"),
    "Unet": ("cmrtpu/models/unet.py::UNet", "redesigned as a flax module"),
    "create_3d_wrapper_for_2d_unet_followed_3d_unet": (
        "cmrtpu/models/hybrids.py::Stacked2D3D",
        "redesigned: z folded into batch, shared 2D trunk + 3D refiner"),
    "create_3d_wrapper_for_2d_unet_concat_input_followed_3d_unet": (
        "cmrtpu/models/hybrids.py::Stacked2D3D", "concat_input=True variant"),
    "create_3d_wrapper_for_2d_unet_avg_with_3D_unet": (
        "cmrtpu/models/hybrids.py::Avg2D3D",
        "averaging hybrid (with/without final conv)"),
    "unet_save": ("cmrtpu/models/unet.py::UNet",
                  "reference DEAD CODE (stale copy of unet(), never called)"),
    "test_unet": ("tests/test_unet.py",
                  "the inline __main__ smoke test becomes a real pytest "
                  "suite"),
    "match_hist_": ("cmrtpu/pipeline/histmatch.py::match_histograms",
                    "reference keeps two near-identical private helpers; "
                    "one implementation covers both"),
    "match_hist": ("cmrtpu/pipeline/histmatch.py::match_histograms", ""),
    "get_phase": (
        "cmrtpu/data/dataset.py::get_phase_for_patient_timestep",
        "renamed; Info.cfg-driven instead of excel-sheet-driven"),
    "augmentation_compose_2d_3d_4d": (
        "cmrtpu/pipeline/augment.py::make_batch_augmenter",
        "redesigned: the 4 albumentations transforms re-derived as ONE "
        "fused separable coordinate map, one draw broadcast over z/t "
        "(ReplayCompose parity)"),
    "match_2d_hist_on_2d": ("cmrtpu/pipeline/histmatch.py::match_2d_on_nd",
                            "one nd dispatcher covers the 2d/3d/4d trio"),
    "match_2d_hist_on_3d": ("cmrtpu/pipeline/histmatch.py::match_2d_on_nd",
                            ""),
    "match_2d_hist_on_4d": ("cmrtpu/pipeline/histmatch.py::match_2d_on_nd",
                            ""),
    "PrintException": ("cmrtpu/utils/io_utils.py::console_and_file_logger",
                       "error-file logging replaces the manual traceback "
                       "printer"),
    "show_available_gpus": (
        "cmrtpu/utils/io_utils.py::show_available_devices",
        "device inventory is mesh-based (TPU-native)"),
    "show_free_gpus": ("cmrtpu/parallel/mesh.py::create_mesh",
                       "no per-GPU memory probing on TPU; the mesh owns "
                       "device selection"),
    "choose_gpu_by_id": ("cmrtpu/parallel/mesh.py::create_mesh",
                         "CUDA_VISIBLE_DEVICES pinning re-designed as mesh "
                         "construction"),
    "TrainValTensorBoard": (
        "cmrtpu/train/callbacks.py::TensorBoardLogger",
        "single writer emits train+val scalars via the first-party "
        "tfevents codec"),
    "PolynomialDecay": (
        "cmrtpu/train/callbacks.py::PolynomialDecaySchedule", "renamed"),
    "PhaseRegressionCallback": (
        "cmrtpu/train/callbacks.py::ImageWriter",
        "same mechanics as CustomImageWritertf2 (prediction image "
        "summaries); the phase-regression-specific plotting belongs to a "
        "sibling project"),
    "copy_meta_and_save": (
        "cmrtpu/io/geometry.py::copy_meta",
        "metadata copy across 2D/3D/4D dimension cases; persistence is the "
        "io writer's job (cmrtpu/io separation)"),
    "split_one_4d_sitk_in_list_of_3d_sitk": (
        "cmrtpu/data/dataset.py::split_4d_into_3d",
        "renamed; operates on MedicalImage instead of sitk"),
    "describe_sitk": ("cmrtpu/data/dataset.py::describe_image",
                      "renamed; MedicalImage geometry summary"),
    "BaseGenerator": (
        "cmrtpu/pipeline/generator.py::DataGenerator",
        "base/subclass split redesigned as one two-stage generator "
        "(cached deterministic fix + fused jit stochastic stage)"),
    "clean_3d_prediction_3d_cc": (
        "cmrtpu/ops/connected_components.py::clean_prediction_3d_cc",
        "on-device 3D CC (26-conn label propagation), host cross-checked"),
    "clean_3d_prediction_2d_cc": (
        "cmrtpu/ops/connected_components.py::clean_prediction_2d_cc",
        "on-device per-slice 2D CC (XLA + Pallas kernel); host twin "
        "clean_3d_prediction_2d_cc_host kept for verification"),
    "resample_3D": (
        "cmrtpu/ops/resample.py::resample_image",
        "redesigned: separable ITK-semantics resampler, host (resample_nd) "
        "+ jit (resample_nd_jax) twins"),
    "UpSampling3DInterpol": (
        "cmrtpu/models/layers.py::upsample_3d_interpol", "renamed"),
    "Inverse3DMatrix": (
        "cmrtpu/models/layers.py::invert_affine_matrix", "renamed"),
    "Euler2Matrix": (
        "cmrtpu/models/layers.py::euler_to_affine_matrix", "renamed"),
    "conv_layer_fn": ("cmrtpu/models/unet.py::ConvBlock",
                      "same-math functional twin of ConvBlock"),
    "eulerAnglesToRotationMatrix_fn": (
        "cmrtpu/models/layers.py::euler_angles_to_rotation_matrix",
        "renamed (numpy twin)"),
    "affineMatrixInverter_fn": (
        "cmrtpu/models/layers.py::affine_matrix_inverter",
        "renamed (numpy twin)"),
    "dice_coef_lower": (
        "cmrtpu/train/losses.py::dice_coef_lower",
        "module-level alias of dice_coef_myo (= reference semantics)"),
    "dice_coef_upper": (
        "cmrtpu/train/losses.py::dice_coef_upper",
        "module-level alias of dice_coef_lv"),
    "BceDiceLoss": (
        "cmrtpu/train/losses.py::bce_dice_loss",
        "class wrapper flattened to a function; get_loss maps the config "
        "names 'BceDiceLoss'/'BcdDiceLoss' [sic] to it"),
    "create_unet": ("cmrtpu/models/unet.py::build_model",
                    "config-driven factory (len(DIM) selects 2D/3D)"),
    "create_3d_wrapper_for_2d_unet": (
        "cmrtpu/models/hybrids.py::SliceDistributed2D",
        "z-unstack/restack redesigned as z folded into the batch axis"),
    "create_2d_3d_avg_model": ("cmrtpu/models/hybrids.py::Avg2D3D",
                               "renamed"),
    "unet": ("cmrtpu/models/unet.py::UNet",
             "functional graph builder redesigned as a flax module "
             "(supervision/heads as knobs)"),
    "clean": ("cmrtpu/eval/landmarks.py::get_differences",
              "reference helper used only by the dead get_diffs; the None "
              "filtering is inlined"),
    "StepDecay": ("cmrtpu/train/callbacks.py::StepDecaySchedule", "renamed"),
    "LRTensorBoard": (
        "cmrtpu/train/callbacks.py::TensorBoardLogger",
        "TB scalars + lr via the first-party tfevents writer"),
    "finetune_with_SGD": (
        "cmrtpu/train/callbacks.py::finetune_with_sgd", "renamed (pep8)"),
    "CustomImageWritertf2": (
        "cmrtpu/train/callbacks.py::ImageWriter",
        "pred-vs-gt image summaries (PNG + TB) without TF"),
    "ImageSaver": ("cmrtpu/train/callbacks.py::ImageWriter",
                   "PNG-dump mode of the same writer"),
    "Console_and_file_logger": (
        "cmrtpu/utils/io_utils.py::console_and_file_logger",
        "renamed (pep8)"),
}

DEF_RE = re.compile(r"(def|class)\s+([A-Za-z_][A-Za-z0-9_]*)")


def list_defs(root):
    """(relpath, line, kind, name) for public top-level defs under root."""
    out = []
    for dirp, _, files in os.walk(root):
        for fn in sorted(files):
            if not fn.endswith(".py"):
                continue
            p = os.path.join(dirp, fn)
            rel = os.path.relpath(p, os.path.dirname(root))
            with open(p, encoding="utf-8", errors="replace") as fh:
                for i, line in enumerate(fh, 1):
                    m = DEF_RE.match(line)  # top-level only (column 0)
                    if m and not m.group(2).startswith("_"):
                        out.append((rel, i, m.group(1), m.group(2)))
    return out


def index_cmrtpu():
    """name -> defining file, for every def/class at any indent level."""
    idx = {}
    inner = re.compile(r"\s*(?:def|class)\s+([A-Za-z_][A-Za-z0-9_]*)")
    for tree in ("cmrtpu", "tests"):
        for dirp, _, files in os.walk(tree):
            for fn in sorted(files):
                if not fn.endswith(".py"):
                    continue
                p = os.path.join(dirp, fn)
                with open(p, encoding="utf-8", errors="replace") as fh:
                    for line in fh:
                        m = inner.match(line)
                        if m:
                            idx.setdefault(m.group(1), p)
    return idx


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="/root/reference")
    ap.add_argument("--out", default="docs/PARITY.md")
    args = ap.parse_args()

    refs = list_defs(os.path.join(args.ref, "src"))
    idx = index_cmrtpu()

    out = [
        "# PARITY — reference symbol → cmrtpu cross-walk\n",
        "Every public top-level `def`/`class` in the reference "
        "(`/root/reference/src`),",
        "mapped to the cmrtpu equivalent. \"Same name\" rows were matched "
        "mechanically",
        "(the symbol is DEFINED in the named cmrtpu module — usually a "
        "re-derivation that",
        "keeps the reference name as its public contract); annotated rows "
        "are renames,",
        "redesigns, or reference dead code. Generated by "
        "tools/gen_parity.py;",
        "regenerate after adding modules.\n",
    ]
    byfile = collections.OrderedDict()
    for rel, line, kind, name in refs:
        byfile.setdefault(rel, []).append((line, kind, name))

    n_same = n_manual = n_unmapped = 0
    for rel in sorted(byfile):
        out.append(f"\n## {rel}\n")
        out.append("| ref symbol (line) | cmrtpu | notes |")
        out.append("|---|---|---|")
        for line, kind, name in sorted(byfile[rel]):
            if name == "main":
                # each reference CLI's main maps to its own cmrtpu CLI
                cli = {"make_dataset.py": "make_dataset",
                       "train_model.py": "train",
                       "predict_model.py": "predict",
                       "evaluate_cv.py": "evaluate_cv",
                       "predict_4d_on_seg.py": "predict_4d"}.get(
                           os.path.basename(rel))
                if cli:
                    out.append(f"| `main` (:{line}) | "
                               f"`cmrtpu/cli/{cli}.py::main` | same flags |")
                    n_same += 1
                    continue
            if name in MANUAL:
                tgt, note = MANUAL[name]
                n_manual += 1
            elif name in idx:
                tgt, note = f"{idx[name]}::{name}", "same name"
                n_same += 1
            else:
                tgt, note = "**UNMAPPED**", ""
                n_unmapped += 1
            out.append(f"| `{name}` (:{line}) | `{tgt}` | {note} |")

    out.append(f"\n---\n{n_same} same-name symbols, {n_manual} "
               f"renamed/redesigned/dead — {n_same + n_manual}/{len(refs)} "
               f"mapped, {n_unmapped} unmapped.")
    with open(args.out, "w") as fh:
        fh.write("\n".join(out) + "\n")
    print(f"wrote {args.out}: {n_same} same-name, {n_manual} manual, "
          f"{n_unmapped} unmapped")
    return 1 if n_unmapped else 0


if __name__ == "__main__":
    raise SystemExit(main())
