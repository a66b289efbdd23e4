"""Figshare dataset downloader (counterpart of reference
flybody/download_data.py:10-63): fetches the walking/flight imitation
datasets, the WPG base pattern, and trained reference policies."""

from __future__ import annotations

import os

# Figshare collection used by the reference (see reference README.md and
# download_data.py). Keys name the artifacts as the reference does.
FIGSHARE_BASE = 'https://api.figshare.com/v2'

DATASETS = {
    'walking': 'flybody walking imitation dataset',
    'flight': 'flybody flight imitation dataset',
    'wpg-pattern': 'wing beat pattern for WPG',
    'trained-policies': 'trained policy networks',
}


def figshare_download(what: str, dest_dir: str = '.',
                      article_id: int | None = None) -> list[str]:
    """Download a reference dataset from figshare.

    Args:
        what: one of DATASETS keys, or 'all'.
        dest_dir: output directory.
        article_id: optionally override the figshare article id.

    Returns:
        List of downloaded file paths.
    """
    try:
        import requests
    except ImportError as e:
        raise ImportError(
            'figshare download requires the `requests` package') from e

    os.makedirs(dest_dir, exist_ok=True)
    if article_id is None:
        raise ValueError(
            'Pass the figshare article id for the dataset to download '
            '(see the upstream flybody README for the published ids).')
    files = requests.get(
        f'{FIGSHARE_BASE}/articles/{article_id}/files', timeout=60).json()
    out = []
    for f in files:
        name, url = f['name'], f['download_url']
        path = os.path.join(dest_dir, name)
        if os.path.exists(path):
            out.append(path)
            continue
        with requests.get(url, stream=True, timeout=600) as r:
            r.raise_for_status()
            with open(path, 'wb') as fh:
                for chunk in r.iter_content(chunk_size=1 << 20):
                    fh.write(chunk)
        out.append(path)
    return out
