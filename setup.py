import os

from setuptools import find_packages, setup

exec(open("nmrgnn_tpu/version.py").read())

setup(
    name="nmrgnn_tpu",
    version=__version__,  # noqa: F821
    description=(
        "TPU-native (JAX/XLA/Pallas) framework for predicting NMR chemical "
        "shifts of proteins and organic molecules with message-passing GNNs"
    ),
    packages=find_packages(exclude=["tests*"]),
    install_requires=[
        "jax",
        "flax",
        "optax",
        "numpy",
        "scipy",
        "click",
        "pandas",
        "tqdm",
    ],
    python_requires=">=3.10",
    entry_points={
        "console_scripts": ["nmrgnn-tpu = nmrgnn_tpu.cli:main"],
    },
    package_data={"nmrgnn_tpu": ["models/baseline/*"]},
)
