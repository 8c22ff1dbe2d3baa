"""Generate the documentation figures into docs/images/.

The reference ships plotted notebooks and a docs/images/ directory
(reference mkdocs.yml:79-83, docs/transform.ipynb); this script is the
tpu-native analog: every figure is COMPUTED by the real public API at
small size and rendered with matplotlib, so the pictures can never drift
from the code.  Runs in the test suite like every example
(tests/test_examples.py) and regenerates the PNGs deterministically.

Figures:
  llc_topology.png       13-face LLC layout with halo-exchange arrows
  llc_halo_sources.png   which neighbour fills each face's halo
  density_remap.png      depth -> potential-density remap, linear +
                         conservative (column sums conserved)
"""

import pathlib

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
from matplotlib.colors import LinearSegmentedColormap

import jax

jax.config.update("jax_platforms", "cpu")

import xgcm_tpu as xt
from xgcm_tpu.grids import LLC_CONNECTIONS, llc_grid

IMAGES = pathlib.Path(__file__).resolve().parents[1] / "docs" / "images"

# palette (validated light-mode set; see docs contributor guide)
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
BLUE = "#2a78d6"
ORANGE = "#eb6834"
AQUA = "#1baf7a"
# diverging: blue -> neutral gray -> orange (two hues + neutral midpoint)
DIVERGING = LinearSegmentedColormap.from_list(
    "div", [BLUE, "#b9b8b3", ORANGE]
)
# sequential: one hue, light -> dark
SEQUENTIAL = LinearSegmentedColormap.from_list(
    "seq", ["#e8f0fb", BLUE, "#123a6b"]
)

# geographic arrangement of the 13 LLC faces on the page: columns are the
# three southern strips + cap + three northern (rotated) strips, matching
# the MITgcm LLC documentation layout
_LLC_LAYOUT = {
    0: (3, 0), 1: (2, 0), 2: (1, 0),
    3: (3, 1), 4: (2, 1), 5: (1, 1),
    6: (0, 1),                      # the Arctic cap
    7: (0, 2), 8: (1, 2), 9: (2, 2),
    10: (0, 3), 11: (1, 3), 12: (2, 3),
}


def _style_axes(ax):
    ax.set_facecolor(SURFACE)
    for s in ax.spines.values():
        s.set_color(INK2)
        s.set_linewidth(0.6)
    ax.tick_params(colors=INK2, labelsize=8)


def fig_llc_topology(path):
    """13-face layout; every face connection drawn as an arrow, swapped
    (rotated) seams in orange."""
    fig, ax = plt.subplots(figsize=(7.2, 5.6), facecolor=SURFACE)
    _style_axes(ax)
    cell = 1.0
    centers = {}
    for face, (row, col) in _LLC_LAYOUT.items():
        x0, y0 = col * 1.35, (3 - row) * 1.35
        centers[face] = (x0 + cell / 2, y0 + cell / 2)
        ax.add_patch(plt.Rectangle(
            (x0, y0), cell, cell, fill=True, facecolor="#e8f0fb",
            edgecolor=BLUE, linewidth=1.2,
        ))
        ax.text(x0 + cell / 2, y0 + cell / 2, str(face), ha="center",
                va="center", fontsize=13, color=INK)

    drawn = set()
    for face, links in LLC_CONNECTIONS["face"].items():
        for axis, (left, right) in links.items():
            for link in (left, right):
                if link is None:
                    continue
                nb, nb_axis, reverse = link
                key = frozenset({(face, axis), (nb, nb_axis)})
                if key in drawn:
                    continue
                drawn.add(key)
                x1, y1 = centers[face]
                x2, y2 = centers[nb]
                swapped = nb_axis != axis
                color = ORANGE if swapped else INK2
                ax.annotate(
                    "", xy=(x2, y2), xytext=(x1, y1),
                    arrowprops=dict(
                        arrowstyle="<->", color=color,
                        lw=1.8 if swapped else 1.0,
                        shrinkA=16, shrinkB=16,
                        connectionstyle="arc3,rad=0.12",
                    ),
                )
    ax.plot([], [], color=INK2, lw=1.0, label="same-axis halo exchange")
    ax.plot([], [], color=ORANGE, lw=1.8,
            label="rotated seam (X↔Y swap + sign rules)")
    ax.legend(loc="lower right", fontsize=8, frameon=False,
              labelcolor=INK2)
    ax.set_xlim(-0.3, 5.5)
    ax.set_ylim(-0.3, 5.5)
    ax.set_aspect("equal")
    ax.set_xticks([])
    ax.set_yticks([])
    ax.set_title("LLC 13-face topology and its halo exchanges",
                 color=INK, fontsize=11)
    fig.savefig(path, dpi=110, bbox_inches="tight", facecolor=SURFACE)
    plt.close(fig)


def fig_llc_halo(path, n=48):
    """The halo machinery, visible: diff a per-face-constant field (value
    = face index) across X and Y through the connected topology.  The
    result is zero everywhere EXCEPT the first row/column of each face,
    where it equals (neighbour − self): each nonzero strip shows exactly
    which neighbour that face's halo was filled from — including the
    rotated cap seams, where an X-diff pulls a neighbour's ROW."""
    ds, grid = llc_grid(n=n)
    field = np.broadcast_to(
        np.arange(13, dtype=np.float64)[:, None, None], (13, n, n)
    ).copy()
    g = xt.GriddedArray(field, ("face", "y", "x"))
    dx = np.asarray(grid.diff(g, "X", boundary="fill").data)
    dy = np.asarray(grid.diff(g, "Y", boundary="fill").data)
    # the figure's claim, asserted before drawing: interiors are exactly 0
    assert float(np.max(np.abs(dx[:, :, 1:]))) == 0.0
    assert float(np.max(np.abs(dy[:, 1:, :]))) == 0.0
    vmax = float(np.max(np.abs(np.stack([dx, dy]))))

    # seam strips are one cell wide; widen them into bands so they render
    # (values unchanged — every seam's strip is constant for this field)
    band = max(n // 7, 4)
    disp_x = np.zeros_like(dx)
    disp_x[:, :, :band] = dx[:, :, :1]
    disp_y = np.zeros_like(dy)
    disp_y[:, :band, :] = dy[:, :1, :]
    # an UNCONNECTED seam (link None) is a boundary fill, not a halo
    # exchange: blank it in the display so only real exchanges show
    for f, links in LLC_CONNECTIONS["face"].items():
        if links["X"][0] is None:
            disp_x[f] = 0.0
        if links["Y"][0] is None:
            disp_y[f] = 0.0

    fig, axes = plt.subplots(
        1, 2, figsize=(10.8, 5.2), facecolor=SURFACE
    )
    for ax, z, raw, which in zip(
        axes, (disp_x, disp_y), (dx, dy), ("X", "Y")
    ):
        _style_axes(ax)
        for face, (row, col) in _LLC_LAYOUT.items():
            x0, y0 = col * 1.04, (3 - row) * 1.04
            ax.imshow(
                z[face], extent=(x0, x0 + 1, y0, y0 + 1),
                origin="lower", cmap=DIVERGING, vmin=-vmax, vmax=vmax,
            )
            ax.text(x0 + 0.45, y0 + 0.45, str(face), fontsize=10,
                    color=INK)
            # label the halo band with its SOURCE face, read from the
            # connection table; assert the drawn data agrees (diff at a
            # connected seam is self - neighbour; an UNCONNECTED seam is
            # a boundary fill and gets no label)
            left_link = LLC_CONNECTIONS["face"][face][which][0]
            if left_link is not None:
                src = left_link[0]
                delta = float(raw[face, n // 2, 0] if which == "X"
                              else raw[face, 0, n // 2])
                assert int(round(face - delta)) == src, (face, which, delta)
                if which == "X":
                    ax.text(x0 + 0.03, y0 + 0.45, f"←{src}",
                            fontsize=8, color=SURFACE, fontweight="bold")
                else:
                    ax.text(x0 + 0.42, y0 + 0.03, f"↓{src}",
                            fontsize=8, color=SURFACE, fontweight="bold")
        ax.set_xlim(-0.1, 4.3)
        ax.set_ylim(-0.1, 4.3)
        ax.set_aspect("equal")
        ax.set_xticks([])
        ax.set_yticks([])
        ax.set_title(f"diff along {which}", color=INK, fontsize=10)
    sm = plt.cm.ScalarMappable(
        cmap=DIVERGING, norm=plt.Normalize(-vmax, vmax)
    )
    cbar = fig.colorbar(sm, ax=list(axes), shrink=0.7, pad=0.02)
    cbar.ax.tick_params(colors=INK2, labelsize=8)
    cbar.set_label("neighbour − self at the seam (strips widened to "
                   "render; interiors exactly 0)", color=INK2, fontsize=9)
    fig.suptitle(
        "Where each face's halo comes from: diff of a per-face-constant "
        "field (←n / ↓n = source face)",
        color=INK, fontsize=11,
    )
    fig.savefig(path, dpi=110, bbox_inches="tight", facecolor=SURFACE)
    plt.close(fig)


def fig_density_remap(path, nz=30):
    """Depth -> density remap: the profile view (left) and the remapped
    tracer (right), with conservative totals shown conserved."""
    rng = np.random.RandomState(4)
    zc = np.arange(nz) + 0.5
    zo = np.arange(nz + 1.0)
    ds = xt.Dataset(coords={
        "zc": ("zc", -zc, {"axis": "Z"}),
        "zo": ("zo", -zo, {"axis": "Z", "c_grid_axis_shift": -0.5}),
    })
    grid = xt.Grid(ds, periodic=False)
    # a stratified density profile + a tracer with a subsurface maximum
    sigma = 24.0 + 4.5 * (zc / nz) ** 0.8 + 0.1 * np.sin(zc / 3)
    tracer = np.exp(-((zc - 9.0) ** 2) / 18.0) + 0.05 * rng.rand(nz)
    sig_g = xt.GriddedArray(sigma, ("zc",), name="sigma")
    tr_g = xt.GriddedArray(tracer, ("zc",), name="tracer")
    targets = np.linspace(24.2, 28.4, 22)

    lin = grid.transform(tr_g, "Z", targets, target_data=sig_g,
                         method="linear")
    sig_outer = grid.interp(sig_g, "Z", to="outer", boundary="extend")
    bins = np.linspace(24.0, 28.6, 16)
    cons = grid.transform(tr_g, "Z", bins, target_data=sig_outer,
                          method="conservative")
    total_depth = float(np.sum(tracer))
    total_sigma = float(np.nansum(np.asarray(cons.data)))

    fig, (ax1, ax2) = plt.subplots(
        1, 2, figsize=(8.4, 4.2), facecolor=SURFACE
    )
    for ax in (ax1, ax2):
        _style_axes(ax)
        ax.grid(True, color="#e4e3de", linewidth=0.6)
        ax.set_axisbelow(True)

    ax1.plot(sigma, -zc, color=BLUE, lw=2, label="σ(z)")
    for t in targets[::3]:
        ax1.axvline(t, color=INK2, lw=0.5, alpha=0.35)
    ax1.set_xlabel("potential density σ", color=INK2, fontsize=9)
    ax1.set_ylabel("depth (levels)", color=INK2, fontsize=9)
    ax1.set_title("stratification and target surfaces", color=INK,
                  fontsize=10)
    ax1.text(float(sigma[nz // 2]) + 0.12, -zc[nz // 2], "σ(z)",
             color=BLUE, fontsize=9)

    ax2.plot(tracer, -zc, color=BLUE, lw=2, label="tracer on depth")
    lin_np = np.asarray(lin.data)
    ax2.plot(lin_np, -np.interp(targets, sigma, zc), color=ORANGE, lw=2,
             label="remapped onto σ (linear)")
    ax2.set_xlabel("tracer", color=INK2, fontsize=9)
    ax2.set_title(
        "grid.transform: depth → density space", color=INK,
        fontsize=10,
    )
    ax2.legend(fontsize=8, frameon=False, labelcolor=INK2,
               loc="upper right")
    fig.text(
        0.53, 0.005,
        f"conservative remap check: Σ tracer on depth = {total_depth:.6f}"
        f"  =  Σ tracer in σ-bins = {total_sigma:.6f}",
        fontsize=8, color=AQUA, ha="left",
    )
    fig.tight_layout(rect=(0, 0.03, 1, 1))
    fig.savefig(path, dpi=110, bbox_inches="tight", facecolor=SURFACE)
    plt.close(fig)
    assert abs(total_depth - total_sigma) < 1e-6 * abs(total_depth)


def main():
    IMAGES.mkdir(exist_ok=True)
    fig_llc_topology(IMAGES / "llc_topology.png")
    fig_llc_halo(IMAGES / "llc_halo_sources.png")
    fig_density_remap(IMAGES / "density_remap.png")
    print(f"wrote 3 figures to {IMAGES}")


if __name__ == "__main__":
    main()
