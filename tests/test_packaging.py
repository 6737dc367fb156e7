"""ship_package guards (page_segmentation_spark/packaging.py)."""

import os
import zipfile

from page_segmentation_spark import packaging


def test_make_pyfiles_zip_contains_package(tmp_path):
    out = packaging.make_pyfiles_zip(str(tmp_path / "pkg.zip"))
    names = zipfile.ZipFile(out).namelist()
    assert "page_segmentation_spark/queries.py" in names
    assert "page_segmentation_spark/operators/components.py" in names
    assert all(n.endswith(".py") for n in names)


def test_ship_package_noop_when_imported_from_zip(monkeypatch, tmp_path):
    # spark-submit --py-files imports the package from inside the zip:
    # _PKG_DIR is then not a real directory, and shipping must be a
    # no-op (rebuilding would clobber the registered archive with an
    # empty zip and addFile would reject the mismatch).
    fake = str(tmp_path / "page_segmentation_spark.zip" / "page_segmentation_spark")
    monkeypatch.setattr(packaging, "_PKG_DIR", fake)

    class Boom:
        @property
        def sparkContext(self):  # pragma: no cover - must not be reached
            raise AssertionError("ship_package must not touch spark")

    assert packaging.ship_package(Boom()) == fake
    assert not os.path.exists(fake)
