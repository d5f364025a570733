"""ERA5 + GLORYS merge ETL (parity: ref data/combine_era5_glorys.py:24-54).

Resamples hourly ERA5 to daily means, regrids onto the GLORYS grid by
linear interpolation, swaps ERA5's sea-ice cover for GLORYS ``siconc``, and
writes one netCDF per year. xarray is optional (absent in this image)."""

from __future__ import annotations

import os
from typing import Sequence


def combine(
    era5_dir: str,
    glorys_ds,
    out_dir: str,
    years: Sequence[int],
    atmos_vars: Sequence[str] = ("u10", "v10", "t2m", "sshf"),
):
    try:
        import glob

        import xarray as xr
    except ImportError as e:
        raise ImportError("combine requires xarray + netcdf4") from e

    os.makedirs(out_dir, exist_ok=True)
    outputs = []
    for year in years:
        era5 = xr.open_mfdataset(
            glob.glob(os.path.join(era5_dir, f"era5_{year}_*.nc"))
        )
        era5_daily = era5[list(atmos_vars)].resample(time="1D").mean()
        glorys_year = glorys_ds.sel(time=str(year))
        # regrid atmos vars onto the (finer) GLORYS grid (ref :38-44)
        era5_on_glorys = era5_daily.interp(
            latitude=glorys_year.latitude, longitude=glorys_year.longitude
        )
        merged = era5_on_glorys.assign(siconc=glorys_year["siconc"])
        path = os.path.join(out_dir, f"era5_glorys_{year}.nc")
        merged.to_netcdf(path)
        outputs.append(path)
    return outputs
