"""Reference-scale degraded-scenario validation campaign (VERDICT r4 #1).

The reference's only oracle is ATE on minutes-long real sequences spanning
the M3DGR degradation taxonomy (``/root/reference/README.md:146-189,
197-225``): LiDAR-degenerate corridors with recovery, dark/low-texture
stretches, dynamic objects, GNSS outage/re-acquisition, stationary dwells.
Real bags are not redistributable here, so this module renders 60–180 s
sequences in the exact converted-bag TLV format (``m3dgr_sim.py``) with one
degradation scenario each, and replays every one through the FULL fused
stack — LVIO + degeneracy switch + loop closure + global fusion + mesh +
occupancy — with one command (``tools/run_scenarios.py``).

Each scenario carries CI thresholds (slow-marked, ``tests/test_scenarios.py``)
so the campaign is a regression gate, not a one-off table.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np

from ..config.loader import load_config
from ..gnss.spp import GnssMeas
from . import synthetic as sim
from .m3dgr_sim import generate_m3dgr_log, replay_m3dgr_log
from .render import make_room_scene


# -- GNSS epoch serialization for the TLV log (REC_GNSS) -----------------

def gnss_to_rows(meas: list[GnssMeas]) -> np.ndarray:
    """[n, 17] f64: sat psr dopp psr_std dopp_std sat_pos sat_vel clk
    clk_drift az el iono trop."""
    rows = np.zeros((len(meas), 17), np.float64)
    for k, m in enumerate(meas):
        rows[k] = [m.sat, m.psr, m.dopp, m.psr_std, m.dopp_std,
                   *np.asarray(m.sat_pos, np.float64),
                   *np.asarray(m.sat_vel, np.float64),
                   m.sat_clk, m.sat_clk_drift,
                   m.azel[0], m.azel[1], m.iono_delay, m.trop_delay]
    return rows


def rows_to_meas(rows: np.ndarray) -> list[GnssMeas]:
    out = []
    for r in np.asarray(rows, np.float64):
        out.append(GnssMeas(
            sat=int(r[0]), psr=r[1], dopp=r[2], psr_std=r[3], dopp_std=r[4],
            sat_pos=r[5:8].copy(), sat_vel=r[8:11].copy(),
            sat_clk=r[11], sat_clk_drift=r[12], azel=(r[13], r[14]),
            iono_delay=r[15], trop_delay=r[16]))
    return out


# bump to invalidate cached renders on generator changes
_GEN_VERSION = 2

# -- scenario specs -------------------------------------------------------

@dataclass
class ScenarioSpec:
    name: str
    taxonomy: str                  # which M3DGR degradation it emulates
    duration: float
    speed: float = 0.8
    yaw_rate: float = 0.3
    stops: tuple = ()
    scene: str = "room"            # "room" | "corridor" | "arena"
    dark_spans: tuple = ()         # (t0, t1, gain)
    dynamic_obj: bool = False
    use_gnss: bool = False
    gnss_outage: tuple | None = None
    gnss_yaw: float = 0.0
    # CI gates (slow tier)
    max_ate_fused: float = 0.3
    max_ate_vio: float = 0.5
    min_switches: int = 0
    notes: str = ""


SCENARIOS: dict[str, ScenarioSpec] = {
    # nominal: the reference's indoor ATE class is 0.05-0.3 m
    "nominal": ScenarioSpec(
        name="nominal", taxonomy="well-conditioned indoor drive",
        duration=60.0, speed=0.8, yaw_rate=0.3,
        max_ate_fused=0.30, max_ate_vio=0.40,
        notes="reference M3DGR indoor class 0.05-0.3 m"),
    "corridor": ScenarioSpec(
        name="corridor", taxonomy="LiDAR degeneracy + recovery",
        duration=64.0, speed=1.0, yaw_rate=0.0, scene="corridor",
        max_ate_fused=0.8, max_ate_vio=0.8, min_switches=2,
        notes="12 m-range LiDAR in a 70 m corridor: degenerate along the "
              "axis mid-run, recovers near the end walls "
              "(lidarodom.cpp:313-437 switch)"),
    "dark": ScenarioSpec(
        name="dark", taxonomy="dark / low-texture visual stretch",
        duration=75.0, speed=0.8, yaw_rate=0.25,
        dark_spans=((25.0, 40.0, 0.08),),
        max_ate_fused=0.6, max_ate_vio=1.0,
        notes="15 s at 8% exposure (M3DGR Dark sequences; CLAHE on)"),
    "dynamic": ScenarioSpec(
        name="dynamic", taxonomy="dynamic objects crossing the view",
        duration=60.0, speed=0.8, yaw_rate=0.25, dynamic_obj=True,
        max_ate_fused=0.5, max_ate_vio=0.8,
        notes="textured occluder sweeps the image 3 s of every 10 s "
              "(M3DGR Dynamic; outlier gate + RANSAC + depth gating)"),
    "stationary": ScenarioSpec(
        name="stationary", taxonomy="stationary dwell (zero-motion drift)",
        duration=80.0, speed=0.8, yaw_rate=0.25,
        stops=((20.0, 30.0), (50.0, 60.0)),
        max_ate_fused=0.35, max_ate_vio=0.5,
        notes="two 10 s dwells; stationary detectors freeze the window "
              "(estimator.cpp:3294-3324)"),
    "gnss_outage": ScenarioSpec(
        name="gnss_outage", taxonomy="GNSS outage + re-acquisition",
        duration=120.0, speed=1.2, yaw_rate=0.1, scene="arena",
        use_gnss=True, gnss_outage=(60.0, 75.0), gnss_yaw=0.2,
        max_ate_fused=0.8, max_ate_vio=0.8,
        notes="raw psr/dopp tight coupling; 15 s outage mid-run; anchor "
              "refresh + periodic yaw refinement active"),
}


def _scene_and_lidar(spec: ScenarioSpec, seed: int):
    # the planned trajectory (same parameters generate_m3dgr_log uses) —
    # the scene must keep the driven corridor free of boxes, or the
    # camera renders a featureless frame from inside one
    traj = sim.make_planar_trajectory(
        duration=spec.duration, speed=spec.speed, yaw_rate=spec.yaw_rate,
        wobble=0.02, static_time=1.5, ramp_time=1.0, stops=spec.stops)
    path_xy = traj.p[::50, :2]
    if spec.scene == "corridor":
        # 6 m-wide corridor: boxes can sit against the walls (visual
        # texture) while the 1.2 m driven corridor stays clear; the side
        # walls stay parallel -> LiDAR-degenerate along x
        x, y = (-5.0, 65.0), (-3.0, 3.0)
        rects = make_room_scene(x=x, y=y, h=3.0, seed=seed, n_boxes=24,
                                keep_clear=path_xy, clear_radius=1.2)
        lidar = sim.LidarSim.room(x=x, y=y, z=(0.0, 3.0), n_rays=4096,
                                  noise=0.01, seed=seed, max_range=12.0)
    elif spec.scene == "arena":
        x, y = (-16.0, 16.0), (-14.0, 16.0)
        rects = make_room_scene(x=x, y=y, h=3.5, seed=seed, n_boxes=14,
                                keep_clear=path_xy)
        lidar = sim.LidarSim.room(x=x, y=y, z=(0.0, 3.5), n_rays=4096,
                                  noise=0.01, seed=seed)
    else:
        x, y = (-10.0, 14.0), (-7.0, 7.0)
        rects = make_room_scene(x=x, y=y, h=3.0, seed=seed,
                                keep_clear=path_xy)
        lidar = sim.LidarSim.room(x=x, y=y, z=(0.0, 3.0), n_rays=4096,
                                  noise=0.01, seed=seed)
    return rects, lidar


def _image_effect(spec: ScenarioSpec, cam: dict, seed: int):
    """Compose the scenario's image-space degradations."""
    if not spec.dark_spans and not spec.dynamic_obj:
        return None
    W, H = int(cam["width"]), int(cam["height"])
    rng = np.random.default_rng(seed + 77)
    tex = rng.uniform(0.15, 0.9, size=(192, 192)).astype(np.float32)
    tex = 0.5 * tex + 0.5 * np.roll(tex, 1, 0)      # mild smoothing

    def effect(t, gray, depth):
        for (t0, t1, gain) in spec.dark_spans:
            if t0 <= t <= t1:
                # smooth 1 s exposure fall/rise at the span edges
                edge = min(1.0, (t - t0), (t1 - t))
                g = 1.0 + (gain - 1.0) * min(1.0, max(0.0, edge))
                gray = gray * g
        if spec.dynamic_obj:
            period, dur, size = 10.0, 3.0, 160
            ph = t % period
            if ph < dur:
                u0 = int((ph / dur) * (W - size))
                v0 = (H - size) // 2
                # coherently-moving textured patch at 1.2 m: the tracker
                # will latch onto it and the object's motion contradicts
                # egomotion (the YOLO-masking scenario without YOLO)
                shift = int(t * 37) % 192
                patch = np.roll(tex, shift, axis=1)[:size, :size]
                gray = gray.copy()
                depth = depth.copy()
                gray[v0:v0 + size, u0:u0 + size] = patch
                depth[v0:v0 + size, u0:u0 + size] = 1.2
        return gray, depth

    return effect


def _gnss_provider(spec: ScenarioSpec, g_norm: float, seed: int,
                   rate: float = 2.0):
    if not spec.use_gnss:
        return None
    from ..gnss.sim import GnssSim
    gsim = GnssSim(psr_noise=0.7, dopp_noise=0.07, seed=seed)
    yaw = spec.gnss_yaw
    Rz = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                   [np.sin(yaw), np.cos(yaw), 0], [0, 0, 1.0]])
    state = {"last": -1e9}

    def provider(t, p_world, v_world):
        if t - state["last"] < 1.0 / rate - 1e-6:
            return None
        if spec.gnss_outage and spec.gnss_outage[0] <= t <= spec.gnss_outage[1]:
            return None
        state["last"] = t
        meas = gsim.measurements(t=50.0 + t, enu_pos=Rz @ p_world,
                                 enu_vel=Rz @ v_world,
                                 clk_bias=5.0 + 0.5 * t, clk_drift=0.5)
        return gnss_to_rows(meas)

    return provider


def generate_scenario(name: str, log_path: str,
                      config_path: str = "configs/m3dgr.yaml",
                      seed: int = 0) -> ScenarioSpec:
    """Render one campaign sequence to ``log_path`` (converted-bag TLV)."""
    spec = SCENARIOS[name]
    config = load_config(config_path)
    rects, lidar = _scene_and_lidar(spec, seed)
    generate_m3dgr_log(
        log_path, config, duration=spec.duration, speed=spec.speed,
        yaw_rate=spec.yaw_rate, stops=spec.stops, seed=seed,
        scene_rects=rects, lidar_sim=lidar,
        image_effect=_image_effect(spec, config.cam_intrinsics, seed),
        gnss_provider=_gnss_provider(spec, config.estimator.g_norm, seed))
    return spec


def run_scenario(name: str, workdir: str,
                 config_path: str = "configs/m3dgr.yaml",
                 seed: int = 0, num_feats: int = 96,
                 full_stack: bool = True, reuse_log: bool = True) -> dict:
    """Generate (or reuse) + replay one scenario through the full fused
    stack; returns the metrics row for the campaign table."""
    from ..eval.metrics import ate_rmse

    spec = SCENARIOS[name]
    wd = Path(workdir)
    wd.mkdir(parents=True, exist_ok=True)
    # log filename carries a generation-spec digest: a spec change
    # invalidates the cached render, thresholds don't
    import hashlib
    gen_key = (_GEN_VERSION, spec.duration, spec.speed, spec.yaw_rate,
               spec.stops, spec.scene, spec.dark_spans, spec.dynamic_obj,
               spec.use_gnss, spec.gnss_outage, spec.gnss_yaw, seed,
               config_path)
    digest = hashlib.md5(repr(gen_key).encode()).hexdigest()[:10]
    log_path = wd / f"{name}_s{seed}_{digest}.gf2log"
    if not (reuse_log and log_path.exists()):
        generate_scenario(name, str(log_path), config_path, seed)

    config = load_config(config_path)
    res = replay_m3dgr_log(
        str(log_path), config, num_feats=num_feats,
        use_mesh=full_stack, use_occupancy=full_stack,
        use_loop=full_stack, use_gnss=spec.use_gnss,
        use_global=full_stack and spec.use_gnss,
        # campaign-scale cost control: mesh fed every 4th sweep with
        # batched retriangulation; loop optimizations batched per 10
        # keyframes (mapping density / republish cadence, not ATE inputs)
        mesh_every=4, mesh_drain_every=24, loop_optimize_min_gap=10)
    row = {"scenario": name, "taxonomy": spec.taxonomy,
           "duration_s": spec.duration,
           "frames": len(res.outputs), "switches": res.n_switches}
    if len(res.est_p) >= 3:
        # Umeyama-aligned, the evo convention the reference's README
        # evaluation uses — the LIO world frame carries an arbitrary
        # gravity-aligned init yaw when it initializes before the VIO
        row["ate_fused"] = round(float(ate_rmse(
            res.est_p, res.gt_p, align=True)), 4)
    if len(res.est_p_vio) >= 3:
        row["ate_vio"] = round(float(ate_rmse(
            res.est_p_vio, res.gt_p_vio, align=True)), 4)
    if res.mesh_stats:
        row["mesh_tris"] = int(res.mesh_stats.get("triangles", 0))
    if res.occ_prob is not None:
        row["occ_cells"] = int(np.sum(np.abs(res.occ_prob - 0.5) > 0.2))
    if res.n_loops is not None:
        row["loops"] = int(res.n_loops)
    return row
