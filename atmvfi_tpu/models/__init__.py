"""Model definitions: ATM-VFI base / lite as one configurable network."""

from atmvfi_tpu.models.config import ATMVFIConfig, BASE, LITE, get_config
from atmvfi_tpu.models.network import Network

__all__ = ["ATMVFIConfig", "BASE", "LITE", "Network", "get_config"]
