"""CLI: build the 2D training dataset (flag parity with
``python src/data/make_dataset.py -data_root <root> -acdc_data <acdc>``).

Mirrors ref: src/data/make_dataset.py:10-93 — fetch the RVIP 3D label archive
and df_kfold.csv (skipped gracefully offline), pair the original ACDC CMR
volumes with the rvip masks and slice them into per-z 2D nrrd files under
``<data_root>/2D``.
"""

import argparse
import glob
import logging
import os

RVIP_ARCHIVE_URL = ("https://heibox.uni-heidelberg.de/f/"
                    "f7a0c1d2d4c34ebf9b86/?dl=1")  # RVIP labels (ref :30-49)


def clean_import(data_root: str) -> None:
    for temp in glob.glob(os.path.join(data_root, "*.zip*")):
        os.remove(temp)


def main(data_root: str, acdc_path: str) -> None:
    from cmrtpu.data.dataset import create_2d_slices_from_3d_volume_files
    from cmrtpu.utils.io_utils import ensure_dir

    ensure_dir(data_root)
    io_dir = os.path.join(data_root, "io")
    if not os.path.isdir(io_dir) or not glob.glob(os.path.join(io_dir, "*rvip.nrrd")):
        # best-effort download of the RVIP label archive (ref uses wget+unzip)
        rc = os.system(f"wget -q -O {data_root}/rvip.zip '{RVIP_ARCHIVE_URL}' "
                       f"&& unzip -o -q {data_root}/rvip.zip -d {data_root}")
        if rc != 0:
            logging.warning("RVIP archive download failed (offline?); expecting "
                            "masks under %s", io_dir)
        clean_import(data_root)

    imgs = sorted(glob.glob(os.path.join(acdc_path, "*/*frame[0-9][0-9].nii.gz")))
    masks = sorted(glob.glob(os.path.join(data_root, "**/*rvip.nrrd"),
                             recursive=True))
    logging.info("found %d images, %d rvip masks", len(imgs), len(masks))
    assert len(imgs) == len(masks), (
        f"image/mask count mismatch: {len(imgs)} vs {len(masks)}")

    export = os.path.join(data_root, "2D")
    ensure_dir(export)
    for img_f, msk_f in zip(imgs, masks):
        create_2d_slices_from_3d_volume_files(img_f, msk_f, export)
    logging.info("2D slices written to %s", export)

    # the reference ships df_kfold.csv inside the downloaded archive; offline,
    # build an equivalent patient-grouped k-fold split from the slices
    df_path = os.path.join(data_root, "df_kfold.csv")
    if not os.path.exists(df_path):
        from cmrtpu.data.dataset import get_kfolded_data, get_patient
        n_patients = len({get_patient(f)
                          for f in glob.glob(os.path.join(export, "*img.nrrd"))})
        kfolds = min(4, n_patients)  # tiny smoke datasets get fewer folds
        if kfolds >= 2:
            df = get_kfolded_data(kfolds=kfolds, path_to_data=export)
            df.to_csv(df_path, index=False)
            logging.info("k-fold dataframe (%d folds) written to %s",
                         kfolds, df_path)
        else:
            logging.warning("only %d patient(s) — skipping df_kfold.csv",
                            n_patients)


def cli() -> None:
    parser = argparse.ArgumentParser(description="build the RVIP 2D dataset")
    parser.add_argument("-data_root", action="store", default=None)
    parser.add_argument("-acdc_data", action="store", default=None)
    args = parser.parse_args()
    print(f"given parameters: {args}")
    main(args.data_root, args.acdc_data)


if __name__ == "__main__":
    cli()
