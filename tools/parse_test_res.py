"""Aggregate per-seed results scraped from log.txt files
(reference ``tools/parse_test_res.py:64-157``).

Usage:
    python tools/parse_test_res.py output/umeml_gan --keyword cindex
    python tools/parse_test_res.py output/ --multi-exp --ci95
"""

import argparse
import os
import os.path as osp
import re
from collections import OrderedDict, defaultdict

import numpy as np


def listdir_nohidden(path, sort=False):
    items = [f for f in os.listdir(path) if not f.startswith(".")]
    return sorted(items) if sort else items


def compute_ci95(res):
    return 1.96 * np.std(res) / np.sqrt(len(res))


def parse_function(*metrics, directory="", ci95=False, end_signal=None):
    print(f"Parsing files in {directory}")
    subdirs = listdir_nohidden(directory, sort=True)
    outputs = []
    for subdir in subdirs:
        fpath = osp.join(directory, subdir, "log.txt")
        if not osp.isfile(fpath):
            continue
        good_to_go = end_signal is None
        output = OrderedDict()
        with open(fpath, "r") as f:
            for line in f:
                line = line.strip()
                if end_signal and line == end_signal:
                    good_to_go = True
                for metric in metrics:
                    match = metric["regex"].search(line)
                    if match and good_to_go:
                        output.setdefault("file", fpath)
                        output[metric["name"]] = float(match.group(1))
        if output:
            outputs.append(output)
    assert len(outputs) > 0, f"Nothing found in {directory}"

    metrics_results = defaultdict(list)
    for output in outputs:
        msg = ""
        for key, value in output.items():
            if isinstance(value, float):
                msg += f"{key}: {value:.2f}%. "
            else:
                msg += f"{key}: {value}. "
            if key != "file":
                metrics_results[key].append(value)
        print(msg)

    output_results = OrderedDict()
    print("===")
    print(f"Summary of directory: {directory}")
    for key, values in metrics_results.items():
        avg = np.mean(values)
        std = compute_ci95(values) if ci95 else np.std(values)
        print(f"* {key}: {avg:.2f}% +- {std:.2f}%")
        output_results[key] = avg
    print("===")
    return output_results


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("directory", type=str)
    ap.add_argument("--ci95", action="store_true")
    ap.add_argument("--multi-exp", action="store_true")
    ap.add_argument("--keyword", default="accuracy", type=str)
    ap.add_argument("--end-signal", default="Finish training", type=str)
    args = ap.parse_args()

    metric = {
        "name": args.keyword,
        "regex": re.compile(rf"\* {args.keyword}: ([\.\deE+-]+)%"),
    }
    if args.multi_exp:
        final_results = defaultdict(list)
        for directory in listdir_nohidden(args.directory, sort=True):
            results = parse_function(
                metric, directory=osp.join(args.directory, directory),
                ci95=args.ci95, end_signal=args.end_signal,
            )
            for key, value in results.items():
                final_results[key].append(value)
        print("Average performance")
        for key, values in final_results.items():
            print(f"* {key}: {np.mean(values):.2f}%")
    else:
        parse_function(
            metric, directory=args.directory, ci95=args.ci95,
            end_signal=args.end_signal,
        )


if __name__ == "__main__":
    main()
