"""Visualizer (SURVEY.md C21: util/visualizer.py [L]).

Console loss lines + ``loss_log.txt``, HTML image gallery every
display_freq (the repo's main UX), optional TensorBoard scalars behind
``--tf_log`` (torch.utils.tensorboard here instead of TF1 summaries).
"""

from __future__ import annotations

import os
import time

import numpy as np

from . import html as html_mod
from .imaging import mkdirs, save_image


class Visualizer:
    def __init__(self, opt):
        self.opt = opt
        self.tf_log = getattr(opt, "tf_log", False)
        self.use_html = opt.isTrain and not getattr(opt, "no_html", False)
        self.win_size = opt.display_winsize
        self.name = opt.name
        self.log_dir = os.path.join(opt.checkpoints_dir, opt.name)
        self.writer = None
        if self.tf_log:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(os.path.join(self.log_dir, "logs"))
        if self.use_html:
            self.web_dir = os.path.join(self.log_dir, "web")
            self.img_dir = os.path.join(self.web_dir, "images")
            mkdirs(self.web_dir, self.img_dir)
        self.log_name = os.path.join(self.log_dir, "loss_log.txt")
        with open(self.log_name, "a") as f:
            now = time.strftime("%c")
            f.write(f"================ Training Loss ({now}) ================\n")

    # visuals: dict name -> uint8 HWC image
    def display_current_results(self, visuals, epoch, step):
        if self.writer is not None:
            for label, image in visuals.items():
                self.writer.add_image(
                    label, np.asarray(image), step, dataformats="HWC"
                )
        if self.use_html:
            for label, image in visuals.items():
                save_image(
                    image, os.path.join(self.img_dir, f"epoch{epoch:03d}_{label}.png")
                )
            webpage = html_mod.HTML(self.web_dir, f"Experiment name = {self.name}", refresh=30)
            for n in range(epoch, 0, -1):
                webpage.add_header(f"epoch [{n}]")
                ims, txts, links = [], [], []
                for label in visuals:
                    img_path = f"epoch{n:03d}_{label}.png"
                    if os.path.exists(os.path.join(self.img_dir, img_path)):
                        ims.append(img_path)
                        txts.append(label)
                        links.append(img_path)
                if ims:
                    webpage.add_images(ims, txts, links, width=self.win_size)
            webpage.save()

    def plot_current_errors(self, errors, step):
        if self.writer is not None:
            for tag, value in errors.items():
                self.writer.add_scalar(tag, float(value), step)

    def print_current_errors(self, epoch, i, errors, t):
        message = f"(epoch: {epoch}, iters: {i}, time: {t:.3f}) "
        for k, v in errors.items():
            message += f"{k}: {float(v):.3f} "
        print(message, flush=True)
        with open(self.log_name, "a") as f:
            f.write(message + "\n")

    def save_images(self, webpage, visuals, image_path):
        image_dir = webpage.get_image_dir()
        short_path = os.path.basename(str(image_path))
        name = os.path.splitext(short_path)[0]
        webpage.add_header(name)
        ims, txts, links = [], [], []
        for label, image in visuals.items():
            image_name = f"{name}_{label}.png"
            save_image(image, os.path.join(image_dir, image_name))
            ims.append(image_name)
            txts.append(label)
            links.append(image_name)
        webpage.add_images(ims, txts, links, width=self.win_size)
