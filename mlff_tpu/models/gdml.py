"""Training orchestration: solver dispatch, label normalization, model
creation, integration-constant recovery.

Rebuild of ``GDMLTrain.train`` / ``create_model`` / ``_recov_int_const``
(reference: sgdml/train.py:707-1119).  No singleton, no global state: a
``Trainer`` is a plain object, all caches are explicit.

Solver dispatch and the regularization policy mirror the reference exactly:
``lam`` is bumped from the task's 1e-15 to 1e-10 for the CG solvers
(train.py:865-866, 910-911); labels are normalized by their standard
deviation (train.py:835-845).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from .. import __version__
from ..ops import descriptor as dsc
from ..ops import kernel as knl
from ..solvers import preconditioners as pc
from ..solvers.analytic import solve_analytic
from ..solvers.cg import pcg
from ..solvers.iterative import solve_iterative
from ..solvers.pivoted_cholesky import pivoted_cholesky
from ..solvers import preconditioners as pc
from ..utils.log import get_logger
from .predict import Predictor

log = get_logger(__name__)

CG_LAM = 1e-10  # reference train.py:865-866


def _tril_perms_lin(perms: np.ndarray) -> np.ndarray:
    """Reference-format flattened descriptor-permutation index array
    (train.py:783-790): column-major flatten of desc_perms + per-perm offsets."""
    tril_perms = dsc.desc_perms(perms)
    n_perms, dim_d = tril_perms.shape
    perm_offsets = np.arange(n_perms)[:, None] * dim_d
    return (tril_perms + perm_offsets).flatten("F")


class Trainer:
    """Train (s)GDML force-field models from task dicts."""

    def __init__(self, return_K: bool = False):
        self.return_K = return_K

    # -- building blocks ---------------------------------------------------

    def build_kernel_inputs(self, task: dict):
        """Descriptors, Jacobians and device-side kernel metadata for a task."""
        n_train, n_atoms = np.asarray(task["R_train"]).shape[:2]
        spec = dsc.make_spec(n_atoms)
        S = dsc.incidence_matrix(spec)

        lat_and_inv = None
        if "lattice" in task:
            lat = np.asarray(task["lattice"])
            lat_and_inv = (jnp.asarray(lat), jnp.asarray(np.linalg.inv(lat)))

        R = jnp.asarray(np.asarray(task["R_train"], dtype=np.float64))
        cut = task.get("interact_cut_off")
        cut = None if cut is None or (isinstance(cut, float) and np.isnan(cut)) else float(cut)
        X, Jc = dsc.descriptors_from_R(spec, R, lat_and_inv=lat_and_inv,
                                       interact_cut_off=cut)
        P_idx = jnp.asarray(dsc.desc_perms(np.asarray(task["perms"])),
                            dtype=jnp.int32)
        return spec, S, X, Jc, P_idx

    def labels(self, task: dict):
        """Normalized force labels (train.py:835-845).  use_E_cstr appends
        centered negative energies."""
        y = np.asarray(task["F_train"], dtype=np.float64).ravel().copy()
        E_train_mean = None
        if task.get("use_E") and task.get("use_E_cstr"):
            E_train = np.asarray(task["E_train"], dtype=np.float64).ravel()
            E_train_mean = float(E_train.mean())
            y = np.hstack((y, -E_train + E_train_mean))
        y_std = float(np.std(y))
        return y / y_std, y_std, E_train_mean


    @staticmethod
    def _pairwise_fits(n_train: int, n_perms: int) -> bool:
        """Whether the (N, M) pairwise caches fit comfortably (2 arrays,
        f64).  Beyond ~3 GB the matvec switches to the on-the-fly tiled
        backend (ops.kernel._matvec_ref_otf)."""
        return 2 * n_train * n_train * n_perms * 8 <= int(3e9)

    @staticmethod
    def _square_R(task, spec, P_idx) -> "np.ndarray | None":
        """R_train for the kernel cache's square all-pairs fields — only for
        single-perm molecules whose descriptor size trips the large-D paths
        (the square layout accelerates column assembly ~(D/A)x there)."""
        import numpy as _np
        big = (spec.dim * spec.dim_i * 8
               * max(4, int(P_idx.shape[0])) > knl._INFLATION_BUDGET)
        if big and int(P_idx.shape[0]) == 1:
            return _np.asarray(task["R_train"], dtype=_np.float64)
        return None

    # -- main entry --------------------------------------------------------

    def train(
        self,
        task: dict,
        break_percentage: float | None = 0.1,
        n_columns: int | None = None,
        str_preconditioner: str = "random_scores",
        flag_eigvals: bool = False,
        callback=None,
        save_progr_callback=None,
        allow_restarts: bool = False,
        svd_cache: dict | None = None,
        mesh=None,
    ) -> dict:
        """Train a model for the task (reference train.py:707-970).

        ``mesh``: optional jax.sharding.Mesh for the 'cg' solver — the
        kernel operator, preconditioner factors and CG state run
        row-sharded over it (see solvers.iterative.solve_iterative)."""
        task = dict(task)
        solver = str(task["solver_name"])
        assert solver in ("analytic", "cg", "cg_cholesky"), solver

        # start the tunnel's first-d2h setup now, hidden under the
        # descriptor/assembly work (see preconditioners.warm_host_transfer)
        pc.warm_host_transfer()

        t_setup = time.perf_counter()
        spec, S, X, Jc, P_idx = self.build_kernel_inputs(task)
        y, y_std, E_train_mean = self.labels(task)
        n_train = X.shape[0]
        log.info("train setup (descriptors+labels): %.1fs",
                 time.perf_counter() - t_setup)

        if n_columns is not None:
            break_percentage = n_columns / len(y)

        num_iters = None
        resid = None
        inducing = None
        info_solver: dict = {}
        K_dense = None

        if solver == "analytic":
            cache = knl.build_cache(X, Jc, S, P_idx, float(task["sig"]),
                                    float(task["lam"]))
            t0 = time.perf_counter()
            ecstr = bool(task.get("use_E_cstr"))
            cprsn = task.get("cprsn_keep_atoms_idxs")
            if self.return_K:
                alphas_psd, K_dense = solve_analytic(
                    spec, cache, y, return_K=True, use_E_cstr=ecstr,
                    cprsn_keep_atoms_idxs=cprsn,
                )
            else:
                alphas_psd = solve_analytic(
                    spec, cache, y, use_E_cstr=ecstr,
                    cprsn_keep_atoms_idxs=cprsn,
                )
            info_solver["total_time_solve"] = time.perf_counter() - t0

        elif solver == "cg":
            assert break_percentage is None or 0 <= break_percentage <= 1
            task["lam"] = CG_LAM  # stronger ridge for the iterative path
            t_cache = time.perf_counter()
            cache = knl.build_cache(
                X, Jc, S, P_idx, float(task["sig"]), CG_LAM,
                R=self._square_R(task, spec, P_idx),
                pairwise=self._pairwise_fits(X.shape[0], P_idx.shape[0]),
            )
            # fetch one scalar of the last-computed field: the only genuine
            # synchronization on axon remote buffers (block_until_ready —
            # function and method — is a no-op there, measured round 4)
            _sync = cache.A_exp1 if cache.A_exp1 is not None else cache.Xqt
            float(_sync.ravel()[-1])
            cache_build_s = time.perf_counter() - t_cache
            log.info("kernel cache build: %.1fs", cache_build_s)
            res = solve_iterative(
                spec, cache, task, y, y_std,
                break_percentage=break_percentage,
                str_preconditioner=str_preconditioner,
                flag_eigvals=flag_eigvals,
                callback=callback,
                save_progr_callback=self._wrap_ckpt(
                    save_progr_callback, task, spec, S, X, Jc, y, y_std
                ),
                allow_restarts=allow_restarts,
                svd_cache=svd_cache,
                mesh=mesh,
            )
            alphas_psd = res.alphas
            num_iters, resid = res.num_iters, res.resid
            inducing = res.inducing_pts_idxs
            info_solver = res.info
            info_solver["cache_build_s"] = cache_build_s
            if not res.is_conv:
                log.warning(
                    "Iterative solver did not converge; continuing with the "
                    "unconverged model (accuracy will likely be bad)."
                )

        elif solver == "cg_cholesky":
            # standalone matrix-free pivoted-Cholesky PCG
            # (reference iterative_cholesky.py:53-74)
            task["lam"] = CG_LAM
            cache = knl.build_cache(
                X, Jc, S, P_idx, float(task["sig"]), CG_LAM,
                R=self._square_R(task, spec, P_idx),
                pairwise=self._pairwise_fits(X.shape[0], P_idx.shape[0]),
            )
            k = int((break_percentage or 0.1) * cache.n)
            t0 = time.perf_counter()
            fac, info_chol = pivoted_cholesky(spec, cache, max_rank=k)
            P = pc.woodbury_from_factor(fac.L, CG_LAM)
            result = pcg(
                (lambda c, v: knl.matvec_psd(c, v), cache), jnp.asarray(y),
                precon=P, tol=float(task.get("solver_tol", 1e-4)),
            )
            if not result.converged:
                raise RuntimeError("cg_cholesky did not converge")
            alphas_psd = result.x
            num_iters, resid = result.num_iters, result.resid
            inducing = np.asarray(info_chol["pivots"])
            info_solver = {
                **info_chol,
                "is_conv": result.converged,
                "total_time_cg": result.time_s,
                "total_time_solve": time.perf_counter() - t0,
            }

        t_model = time.perf_counter()
        # model boundary: reference sign convention
        alphas_F_psd = alphas_psd
        alphas_E_ref = None
        if task.get("use_E_cstr"):
            alphas_F_psd = alphas_psd[: -n_train]
            alphas_E_ref = -alphas_psd[-n_train:]
        alphas_F_ref = -alphas_F_psd

        model = self.create_model(
            task, solver, np.asarray(X), np.asarray(Jc), y_std,
            alphas_F_ref, alphas_E=alphas_E_ref,
            solver_resid=resid, solver_iters=num_iters,
            norm_y_train=float(np.linalg.norm(y)),
            inducing_pts_idxs=inducing if solver == "cg" else None,
        )
        model.update(
            {k: v for k, v in info_solver.items()
             if isinstance(v, (int, float, bool, np.ndarray))}
        )

        if model["use_E"]:
            c = (
                self._recov_int_const(model, task, np.asarray(X), np.asarray(Jc))
                if E_train_mean is None
                else E_train_mean
            )
            if c is None:
                model["use_E"] = False
            else:
                model["c"] = c

        finalize_s = time.perf_counter() - t_model
        model["finalize_s"] = finalize_s
        log.info("model finalize: %.1fs", finalize_s)
        if self.return_K and K_dense is not None:
            return model, K_dense, alphas_psd
        return model

    # -- model record ------------------------------------------------------

    def create_model(
        self, task, solver, R_desc, R_d_desc, std, alphas_F,
        alphas_E=None, solver_resid=None, solver_iters=None,
        norm_y_train=None, inducing_pts_idxs=None,
    ) -> dict:
        """Assemble the trained-model artifact (reference train.py:597-702)."""
        n_train = R_desc.shape[0]
        n_atoms = int(np.asarray(task["z"]).shape[0])
        spec = dsc.make_spec(n_atoms)
        S = dsc.incidence_matrix(spec)

        if "cprsn_keep_atoms_idxs" in task:
            # symmetry-compressed coefficients: contract against the kept
            # atoms' Jacobian columns only (reference train.py:616-634)
            keep = np.asarray(task["cprsn_keep_atoms_idxs"])
            Jfull = np.asarray(
                jnp.einsum("qa,kqx->kqax", S, jnp.asarray(R_d_desc))
            )  # (N, D, A, 3)
            a3 = np.asarray(alphas_F).reshape(n_train, len(keep), 3)
            r_d_desc_alpha = np.einsum("kqax,kax->kq", Jfull[:, :, keep, :], a3)
        else:
            r_d_desc_alpha = np.asarray(dsc.d_desc_dot_vec(
                jnp.asarray(R_d_desc), S,
                jnp.asarray(np.asarray(alphas_F).reshape(n_train, n_atoms, 3)),
            ))

        model = {
            "type": "m",
            "code_version": __version__,
            "dataset_name": task["dataset_name"],
            "dataset_theory": task["dataset_theory"],
            "solver_name": solver,
            "solver_tol": task["solver_tol"],
            "norm_y_train": norm_y_train,
            "n_inducing_pts_init": task["n_inducing_pts_init"],
            "z": np.asarray(task["z"]),
            "idxs_train": np.asarray(task["idxs_train"]),
            "md5_train": task["md5_train"],
            "idxs_valid": np.asarray(task["idxs_valid"]),
            "md5_valid": task["md5_valid"],
            "n_test": 0,
            "md5_test": None,
            "f_err": {"mae": np.nan, "rmse": np.nan},
            "R_desc": np.asarray(R_desc).T,  # stored transposed, like the reference
            "R_d_desc_alpha": r_d_desc_alpha,
            "interact_cut_off": task.get("interact_cut_off"),
            "c": 0.0,
            "std": std,
            "sig": task["sig"],
            "lam": task["lam"],
            "alphas_F": np.asarray(alphas_F),
            "perms": np.asarray(task["perms"]),
            # flattened permutation index array, for npz compatibility with
            # reference model files (reference train.py:783-790, 673)
            "tril_perms_lin": _tril_perms_lin(np.asarray(task["perms"])),
            "use_E": bool(task["use_E"]),
            "use_cprsn": bool(task["use_cprsn"]),
        }
        if solver_resid is not None:
            model["solver_resid"] = solver_resid
        if solver_iters is not None:
            model["solver_iters"] = solver_iters
        if inducing_pts_idxs is not None:
            model["inducing_pts_idxs"] = np.asarray(inducing_pts_idxs)
        if task["use_E"]:
            model["e_err"] = {"mae": np.nan, "rmse": np.nan}
            if task.get("use_E_cstr") and alphas_E is not None:
                model["alphas_E"] = np.asarray(alphas_E)
        if "lattice" in task:
            model["lattice"] = task["lattice"]
        if "r_unit" in task and "e_unit" in task:
            model["r_unit"] = task["r_unit"]
            model["e_unit"] = task["e_unit"]
        return model

    def _wrap_ckpt(self, save_progr_callback, task, spec, S, X, Jc, y, y_std):
        """Adapt the raw CG snapshot into an unconverged-model dict
        (reference iterative_solver.py:919-954)."""
        if save_progr_callback is None:
            return None

        def wrapped(alphas_psd, num_iters, resid, inducing_pts_idxs):
            alphas_F = -np.asarray(alphas_psd)
            model = self.create_model(
                task, "cg", np.asarray(X), np.asarray(Jc), y_std, alphas_F,
                solver_resid=resid, solver_iters=num_iters + 1,
                norm_y_train=float(np.linalg.norm(y)),
                inducing_pts_idxs=inducing_pts_idxs,
            )
            pred = Predictor.from_alphas(task, np.asarray(X), np.asarray(Jc),
                                         alphas_F, std=y_std)
            E_pred, _ = pred.predict(np.asarray(task["R_train"]))
            E_ref = np.squeeze(np.asarray(task["E_train"]))
            model["c"] = float(np.sum(E_ref - E_pred) / E_ref.shape[0])
            save_progr_callback(model)

        return wrapped

    def _recov_int_const(self, model, task, R_desc, R_d_desc):
        """Least-squares integration constant + label self-diagnosis
        (reference train.py:972-1119)."""
        pred = Predictor(dict(model, c=0.0))
        E_pred, _ = pred.predict(np.asarray(task["R_train"]))
        E_ref = np.squeeze(np.asarray(task["E_train"]))

        e_fact = np.linalg.lstsq(
            np.column_stack((E_pred, np.ones(E_ref.shape))), E_ref, rcond=-1
        )[0][0]
        corrcoef = np.corrcoef(E_ref, E_pred)[0, 1]

        if np.sign(e_fact) == -1:
            log.warning(
                "Dataset seems to contain gradients instead of forces "
                "(flipped sign); disabling energy predictions."
            )
            return None
        if corrcoef < 0.95:
            log.warning(
                "Inconsistent energy labels detected (correlation %.2f); "
                "disabling energy predictions.", corrcoef
            )
            return None
        if np.abs(e_fact - 1) > 1e-1:
            log.warning(
                "Different scales in energy vs force labels (factor ~%.2f); "
                "disabling energy predictions.", e_fact
            )
            return None
        return float(np.sum(E_ref - E_pred) / E_ref.shape[0])
