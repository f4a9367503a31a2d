#!/usr/bin/env python
"""Stamp a checkpoint for release with its content hash
(ref contract: tools/publish_model.py)."""

import argparse
import hashlib
import os
import shutil


def parse_args():
    parser = argparse.ArgumentParser(description='publish a checkpoint')
    parser.add_argument('in_path', help='checkpoint dir or file')
    parser.add_argument('out_path', help='output path (hash appended)')
    return parser.parse_args()


def _hash_path(path):
    sha = hashlib.sha256()
    if os.path.isdir(path):
        for root, _, files in sorted(os.walk(path)):
            for f in sorted(files):
                with open(os.path.join(root, f), 'rb') as fh:
                    for chunk in iter(lambda: fh.read(1 << 20), b''):
                        sha.update(chunk)
    else:
        with open(path, 'rb') as fh:
            for chunk in iter(lambda: fh.read(1 << 20), b''):
                sha.update(chunk)
    return sha.hexdigest()


def main():
    args = parse_args()
    digest = _hash_path(args.in_path)[:8]
    root, ext = os.path.splitext(args.out_path)
    final = f'{root}-{digest}{ext}'
    if os.path.isdir(args.in_path):
        shutil.copytree(args.in_path, final)
    else:
        shutil.copy2(args.in_path, final)
    print(f'published: {final}')


if __name__ == '__main__':
    main()
