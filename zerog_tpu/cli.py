"""Command-line interface, mirroring the reference CLI's subcommands
(reference src/main.rs:22-169):

  predict, compute-accuracy, mock-proof, generate-srs, generate-keys, proof,
  verify, dry-run-evm-verifier, deploy-evm-verifier, submit-proof

Artifacts persist between steps exactly as in the reference (the artifact
pipeline is the checkpoint system; SURVEY.md §5): SRS -> keys + circuit
params -> proof + outputs.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time


def _load_model_image(args, need_image=True):
    from .models import load_wnn, load_grayscale_image

    wnn = load_wnn(args.model_path)
    img = load_grayscale_image(args.img_path) if need_image else None
    return wnn, img


def cmd_predict(args):
    wnn, img = _load_model_image(args)
    scores = [int(v) for v in wnn.predict(img)]
    from .utils import argmax

    print(f"Scores: {scores}")
    print(f"Prediction: {argmax(scores)}")


def cmd_compute_accuracy(args):
    from .models import load_wnn, load_grayscale_image, parse_png_file
    from .utils import argmax

    wnn = load_wnn(args.model_path)
    fwd = None
    correct = total = 0
    t0 = time.time()
    for path in sorted(pathlib.Path(args.img_dir).iterdir()):
        label = parse_png_file(path)
        if label is None:
            continue
        img = load_grayscale_image(path)
        if fwd is None:
            import jax

            fwd = jax.jit(wnn.predict_fn())
        scores = fwd(img)
        correct += int(argmax([int(v) for v in scores]) == label)
        total += 1
        if total % 500 == 0:
            print(f"{total} images, accuracy so far {correct/total:.4f}")
    print(f"Accuracy: {correct}/{total} = {correct/total if total else 0:.4f} "
          f"({time.time()-t0:.1f}s)")


def cmd_mock_proof(args):
    wnn, img = _load_model_image(args)
    wnn.mock_proof(img, args.k)
    print("Mock proof satisfied!")


def cmd_generate_srs(args):
    from .curve import Srs

    srs = Srs.setup(args.k)
    srs.write(args.srs_path)
    print(f"SRS (k={args.k}) written to {args.srs_path}")


def cmd_generate_keys(args):
    from .curve import Srs
    from .models import load_wnn
    from .models.keys_io import write_keys
    from .models.io import write_circuit_params

    wnn = load_wnn(args.model_path)
    srs = Srs.read(args.srs_path)
    t0 = time.time()
    pk = wnn.generate_proving_key(srs)
    write_keys(pk, args.pk_path, args.vk_path)
    write_circuit_params(wnn.get_circuit_params(), args.circuit_params_path)
    print(f"Keys written ({time.time()-t0:.1f}s): {args.pk_path}, {args.vk_path}")


def cmd_proof(args):
    from .curve import Srs
    from .models import load_wnn, load_grayscale_image
    from .models.keys_io import read_pk
    from .models.io import read_circuit_params, write_proof_with_output

    wnn = load_wnn(args.model_path)
    img = load_grayscale_image(args.img_path)
    srs = Srs.read(args.srs_path)
    params = read_circuit_params(args.circuit_params_path)
    pk = read_pk(args.pk_path, params)
    t0 = time.time()
    proof, outputs = wnn.proof(pk, srs, img)
    write_proof_with_output(proof, outputs, args.proof_path)
    print(f"Proof ({len(proof)} bytes, {time.time()-t0:.1f}s) written to {args.proof_path}")


def cmd_verify(args):
    from .curve import Srs
    from .models.keys_io import read_vk
    from .models.io import read_circuit_params, read_proof_with_output
    from .plonk.verifier import verify_proof

    srs = Srs.read(args.srs_path)
    params = read_circuit_params(args.circuit_params_path)
    vk = read_vk(args.vk_path, params)
    proof, outputs = read_proof_with_output(args.proof_path)
    t0 = time.time()
    verify_proof(vk, srs, [outputs], proof)
    print(f"Proof verified ({time.time()-t0:.1f}s). Outputs: {outputs}")


def cmd_evm_stub(args):
    print("EVM verifier generation is not implemented yet in this round; "
          "native verification is available via `verify`.", file=sys.stderr)
    sys.exit(2)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="zerog-tpu", description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)

    def add(name, fn, *specs):
        s = sub.add_parser(name)
        for spec in specs:
            s.add_argument(*spec[0], **spec[1])
        s.set_defaults(fn=fn)
        return s

    model = (["model_path"], {})
    image = (["img_path"], {})
    kflag = (["-k"], {"type": int, "required": True})
    srs_p = (["--srs-path"], {"default": "srs.bin"})
    pk_p = (["--pk-path"], {"default": "pk.npz"})
    vk_p = (["--vk-path"], {"default": "vk.npz"})
    cp_p = (["--circuit-params-path"], {"default": "circuit_params.json"})
    pr_p = (["--proof-path"], {"default": "proof.json"})

    add("predict", cmd_predict, model, image)
    add("compute-accuracy", cmd_compute_accuracy, model, (["img_dir"], {}))
    add("mock-proof", cmd_mock_proof, model, image, kflag)
    add("generate-srs", cmd_generate_srs, kflag, srs_p)
    add("generate-keys", cmd_generate_keys, model, srs_p, pk_p, vk_p, cp_p)
    add("proof", cmd_proof, model, image, srs_p, pk_p, cp_p, pr_p)
    add("verify", cmd_verify, srs_p, vk_p, cp_p, pr_p)
    add("dry-run-evm-verifier", cmd_evm_stub, srs_p, vk_p, cp_p, pr_p)
    add("deploy-evm-verifier", cmd_evm_stub, srs_p, vk_p, cp_p)
    add("submit-proof", cmd_evm_stub, pr_p)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
