"""ERA5 downloader (parity: ref data/download_era5.py:12-117).

Fetches u10/v10/t2m/siconc/sshf monthly netCDF files through the CDS API
with a retry-until-complete loop that deletes partial files. The ``cdsapi``
client is an optional dependency (absent in this image) — importing this
module is safe; calling :func:`download` without it raises a clear error.
"""

from __future__ import annotations

import os
import time
from typing import Optional, Sequence

VARIABLES = (  # ref download_era5.py:25-37
    "10m_u_component_of_wind",
    "10m_v_component_of_wind",
    "2m_temperature",
    "sea_ice_cover",
    "surface_sensible_heat_flux",
)


def month_filename(out_dir: str, year: int, month: int) -> str:
    return os.path.join(out_dir, f"era5_{year}_{month:02d}.nc")


def is_complete(path: str, min_bytes: int = 1024) -> bool:
    return os.path.exists(path) and os.path.getsize(path) >= min_bytes


def download(
    out_dir: str,
    years: Sequence[int],
    months: Sequence[int] = tuple(range(1, 13)),
    area: Sequence[float] = (70, -95, 50, -65),  # Hudson Bay box
    variables: Sequence[str] = VARIABLES,
    max_retries: Optional[int] = None,
    sleep_s: float = 30.0,
):
    """Monthly files with retry-until-complete (ref :72-116)."""
    try:
        import cdsapi
    except ImportError as e:
        raise ImportError(
            "ERA5 download requires the 'cdsapi' package and CDS credentials"
        ) from e

    client = cdsapi.Client()
    os.makedirs(out_dir, exist_ok=True)
    for year in years:
        for month in months:
            path = month_filename(out_dir, year, month)
            attempts = 0
            while not is_complete(path):
                if os.path.exists(path):
                    os.remove(path)  # delete partial files (ref :97-100)
                try:
                    client.retrieve(
                        "reanalysis-era5-single-levels",
                        {
                            "product_type": "reanalysis",
                            "variable": list(variables),
                            "year": str(year),
                            "month": f"{month:02d}",
                            "day": [f"{d:02d}" for d in range(1, 32)],
                            "time": [f"{h:02d}:00" for h in range(24)],
                            "area": list(area),
                            "format": "netcdf",
                        },
                        path,
                    )
                except Exception as err:  # retry forever like the reference
                    attempts += 1
                    if max_retries is not None and attempts >= max_retries:
                        raise
                    print(f"retrying {path} after error: {err}")
                    time.sleep(sleep_s)
    return out_dir
