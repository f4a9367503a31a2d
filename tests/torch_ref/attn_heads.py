"""Torch oracles for NLHead / GCHead / DNLHead (ref mmseg decode_heads/
{nl_head.py,gc_head.py,dnl_head.py} + mmcv NonLocal2d / ContextBlock).

State-dict layout matches the reference exactly: FCNHead(num_convs=2,
concat_input=True) skeleton ``convs.{0,1}``/``conv_cat``/``conv_seg``
with the block at ``nl_block``/``gc_block``/``dnl_block``; NonLocal2d
children ``g/theta/phi`` (ConvModule, no norm, biased conv) and
``conv_out`` (ConvModule conv+bn, no act); ContextBlock ``conv_mask`` +
``channel_add_conv.{0,1,3}`` with LayerNorm([planes, 1, 1]).
"""

import torch
import torch.nn as nn
import torch.nn.functional as F


class ConvModule(nn.Module):
    def __init__(self, in_ch, out_ch, k, padding=0, with_bn=True,
                 act=True):
        super().__init__()
        self.conv = nn.Conv2d(in_ch, out_ch, k, padding=padding,
                              bias=not with_bn)
        if with_bn:
            self.bn = nn.BatchNorm2d(out_ch)
        self._bn, self._act = with_bn, act

    def forward(self, x):
        x = self.conv(x)
        if self._bn:
            x = self.bn(x)
        return F.relu(x) if self._act else x


class NonLocal2d(nn.Module):
    """mmcv embedded_gaussian NonLocal2d."""

    def __init__(self, in_channels, reduction=2, use_scale=True):
        super().__init__()
        self.inter = max(in_channels // reduction, 1)
        self.use_scale = use_scale
        self.g = ConvModule(in_channels, self.inter, 1, with_bn=False,
                            act=False)
        self.theta = ConvModule(in_channels, self.inter, 1, with_bn=False,
                                act=False)
        self.phi = ConvModule(in_channels, self.inter, 1, with_bn=False,
                              act=False)
        self.conv_out = ConvModule(self.inter, in_channels, 1, act=False)

    def forward(self, x):
        n = x.size(0)
        g = self.g(x).view(n, self.inter, -1).permute(0, 2, 1)
        theta = self.theta(x).view(n, self.inter, -1).permute(0, 2, 1)
        phi = self.phi(x).view(n, self.inter, -1)
        pw = torch.matmul(theta, phi)
        if self.use_scale:
            pw = pw / self.inter ** 0.5
        pw = pw.softmax(dim=-1)
        y = torch.matmul(pw, g).permute(0, 2, 1).reshape(
            n, self.inter, *x.shape[2:])
        return x + self.conv_out(y)


class DisentangledNonLocal2d(NonLocal2d):
    """ref dnl_head.py:9-83."""

    def __init__(self, in_channels, reduction=2, use_scale=True,
                 temperature=0.05):
        super().__init__(in_channels, reduction, use_scale)
        self.temperature = temperature
        self.conv_mask = nn.Conv2d(in_channels, 1, 1)

    def forward(self, x):
        n = x.size(0)
        g = self.g(x).view(n, self.inter, -1).permute(0, 2, 1)
        theta = self.theta(x).view(n, self.inter, -1).permute(0, 2, 1)
        phi = self.phi(x).view(n, self.inter, -1)
        theta = theta - theta.mean(dim=-2, keepdim=True)
        phi = phi - phi.mean(dim=-1, keepdim=True)
        pw = torch.matmul(theta, phi)
        if self.use_scale:
            pw = pw / self.inter ** 0.5
        pw = (pw / self.temperature).softmax(dim=-1)
        y = torch.matmul(pw, g)
        unary = self.conv_mask(x).view(n, 1, -1).softmax(dim=-1)
        unary_x = torch.matmul(unary, g)
        y = (y + unary_x).permute(0, 2, 1).reshape(n, self.inter,
                                                   *x.shape[2:])
        return x + self.conv_out(y)


class ContextBlock(nn.Module):
    """mmcv ContextBlock (pooling 'att', fusion channel_add)."""

    def __init__(self, in_channels, ratio=0.25):
        super().__init__()
        planes = max(int(in_channels * ratio), 1)
        self.conv_mask = nn.Conv2d(in_channels, 1, 1)
        self.channel_add_conv = nn.Sequential(
            nn.Conv2d(in_channels, planes, 1),
            nn.LayerNorm([planes, 1, 1]), nn.ReLU(inplace=True),
            nn.Conv2d(planes, in_channels, 1))

    def forward(self, x):
        n, c, h, w = x.shape
        mask = self.conv_mask(x).view(n, 1, h * w).softmax(dim=2)
        ctx = torch.matmul(x.view(n, 1, c, h * w),
                           mask.unsqueeze(-1)).view(n, c, 1, 1)
        return x + self.channel_add_conv(ctx)


class _FCNAttnHead(nn.Module):
    def __init__(self, in_ch, channels, num_classes, block, block_name,
                 in_index=3):
        super().__init__()
        self.in_index = in_index
        self.convs = nn.Sequential(
            ConvModule(in_ch, channels, 3, padding=1),
            ConvModule(channels, channels, 3, padding=1))
        setattr(self, block_name, block)
        self._block_name = block_name
        self.conv_cat = ConvModule(in_ch + channels, channels, 3,
                                   padding=1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        x = inputs[self.in_index]
        out = self.convs[0](x)
        out = getattr(self, self._block_name)(out)
        out = self.convs[1](out)
        out = self.conv_cat(torch.cat([x, out], dim=1))
        return self.conv_seg(out)


def NLHead(in_ch, channels, num_classes, in_index=3):
    return _FCNAttnHead(in_ch, channels, num_classes,
                        NonLocal2d(channels), 'nl_block',
                        in_index=in_index)


def GCHead(in_ch, channels, num_classes, in_index=3):
    return _FCNAttnHead(in_ch, channels, num_classes,
                        ContextBlock(channels), 'gc_block',
                        in_index=in_index)


def DNLHead(in_ch, channels, num_classes, in_index=3):
    return _FCNAttnHead(in_ch, channels, num_classes,
                        DisentangledNonLocal2d(channels), 'dnl_block',
                        in_index=in_index)


class Scale(nn.Module):
    """mmcv.cnn.Scale."""

    def __init__(self, scale=0.0):
        super().__init__()
        self.scale = nn.Parameter(torch.tensor(float(scale)))

    def forward(self, x):
        return x * self.scale


class PAM(nn.Module):
    """ref da_head.py:12-46: bare-conv q/k to pam_channels, v to
    in_channels, no scale norm, gamma residual."""

    def __init__(self, in_channels, channels):
        super().__init__()
        self.channels = channels
        self.key_project = nn.Conv2d(in_channels, channels, 1)
        self.query_project = nn.Conv2d(in_channels, channels, 1)
        self.value_project = nn.Conv2d(in_channels, in_channels, 1)
        self.gamma = Scale(0)

    def forward(self, x):
        n = x.size(0)
        q = self.query_project(x).view(n, self.channels, -1).permute(
            0, 2, 1)
        k = self.key_project(x).view(n, self.channels, -1)
        v = self.value_project(x).view(n, x.size(1), -1).permute(0, 2, 1)
        sim = torch.matmul(q, k).softmax(dim=-1)
        out = torch.matmul(sim, v).permute(0, 2, 1).reshape(x.shape)
        return self.gamma(out) + x


class CAM(nn.Module):
    """ref da_head.py:49-72."""

    def __init__(self):
        super().__init__()
        self.gamma = Scale(0)

    def forward(self, x):
        n, c, h, w = x.shape
        q = x.view(n, c, -1)
        energy = torch.bmm(q, q.permute(0, 2, 1))
        energy = energy.max(-1, keepdim=True)[0].expand_as(energy) - energy
        attn = F.softmax(energy, dim=-1)
        out = torch.bmm(attn, q).view(n, c, h, w)
        return self.gamma(out) + x


class DAHead(nn.Module):
    """ref da_head.py:75-178 (three outputs, three losses)."""

    def __init__(self, in_ch, channels, pam_channels, num_classes,
                 in_index=3):
        super().__init__()
        self.in_index = in_index
        self.pam_in_conv = ConvModule(in_ch, channels, 3, padding=1)
        self.pam = PAM(channels, pam_channels)
        self.pam_out_conv = ConvModule(channels, channels, 3, padding=1)
        self.pam_conv_seg = nn.Conv2d(channels, num_classes, 1)
        self.cam_in_conv = ConvModule(in_ch, channels, 3, padding=1)
        self.cam = CAM()
        self.cam_out_conv = ConvModule(channels, channels, 3, padding=1)
        self.cam_conv_seg = nn.Conv2d(channels, num_classes, 1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        x = inputs[self.in_index]
        pam = self.pam_out_conv(self.pam(self.pam_in_conv(x)))
        pam_out = self.pam_conv_seg(pam)
        cam = self.cam_out_conv(self.cam(self.cam_in_conv(x)))
        cam_out = self.cam_conv_seg(cam)
        return self.conv_seg(pam + cam), pam_out, cam_out


class DAEncoderDecoder(nn.Module):
    """Minimal container: loss = sum of the three resized CEs
    (ref da_head.py:164-178 with loss_weight 1)."""

    def __init__(self, backbone, decode_head):
        super().__init__()
        self.backbone = backbone
        self.decode_head = decode_head

    def forward(self, img):
        return self.decode_head(self.backbone(img))[0]

    def loss(self, img, label):
        outs = self.decode_head(self.backbone(img))
        total = 0
        for logit in outs:
            logit = F.interpolate(logit, size=label.shape[-2:],
                                  mode='bilinear', align_corners=False)
            total = total + F.cross_entropy(
                logit, label, ignore_index=255, reduction='none').mean()
        return total


class EMAModule(nn.Module):
    """ref ema_head.py:19-77 (eval mode: no momentum update)."""

    def __init__(self, channels, num_bases, num_stages):
        super().__init__()
        self.num_bases, self.num_stages = num_bases, num_stages
        bases = torch.zeros(1, channels, num_bases)
        bases.normal_(0, (2.0 / num_bases) ** 0.5)
        self.register_buffer(
            'bases', F.normalize(bases, dim=1, p=2))

    def forward(self, feats):
        n, c, h, w = feats.shape
        feats = feats.view(n, c, h * w)
        bases = self.bases.repeat(n, 1, 1)
        with torch.no_grad():
            for _ in range(self.num_stages):
                attn = torch.einsum('bcn,bck->bnk', feats, bases)
                attn = F.softmax(attn, dim=2)
                attn_l1 = F.normalize(attn, dim=1, p=1)
                bases = torch.einsum('bcn,bnk->bck', feats, attn_l1)
                bases = F.normalize(bases, dim=1, p=2)
        recon = torch.einsum('bck,bnk->bcn', bases, attn)
        return recon.view(n, c, h, w)


class EMAHead(nn.Module):
    """ref ema_head.py:80-168."""

    def __init__(self, in_ch, channels, ema_channels, num_bases,
                 num_stages, num_classes, in_index=3):
        super().__init__()
        self.in_index = in_index
        self.ema_in_conv = ConvModule(in_ch, ema_channels, 3, padding=1)
        self.ema_mid_conv = ConvModule(ema_channels, ema_channels, 1,
                                       with_bn=False, act=False)
        for p in self.ema_mid_conv.parameters():
            p.requires_grad = False
        self.ema_module = EMAModule(ema_channels, num_bases, num_stages)
        self.ema_out_conv = ConvModule(ema_channels, ema_channels, 1,
                                       act=False)
        self.bottleneck = ConvModule(ema_channels, channels, 3, padding=1)
        self.conv_cat = ConvModule(in_ch + channels, channels, 3,
                                   padding=1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        x = inputs[self.in_index]
        feats = self.ema_in_conv(x)
        identity = feats
        recon = self.ema_module(self.ema_mid_conv(feats))
        recon = self.ema_out_conv(F.relu(recon))
        out = self.bottleneck(F.relu(identity + recon))
        out = self.conv_cat(torch.cat([x, out], dim=1))
        return self.conv_seg(out)


class Encoding(nn.Module):
    """ref mmseg/ops/encoding.py:6-74."""

    def __init__(self, channels, num_codes):
        super().__init__()
        self.channels, self.num_codes = channels, num_codes
        std = 1.0 / ((num_codes * channels) ** 0.5)
        self.codewords = nn.Parameter(
            torch.empty(num_codes, channels).uniform_(-std, std))
        self.scale = nn.Parameter(
            torch.empty(num_codes).uniform_(-1, 0))

    def forward(self, x):
        n = x.size(0)
        x = x.view(n, self.channels, -1).transpose(1, 2).contiguous()
        expanded = x.unsqueeze(2)  # (B, N, 1, C)
        dist = self.scale.view(1, 1, -1) * (
            expanded - self.codewords.view(1, 1, self.num_codes,
                                           self.channels)).pow(2).sum(3)
        assign = F.softmax(dist, dim=2)
        enc = (assign.unsqueeze(3) *
               (expanded - self.codewords.view(1, 1, self.num_codes,
                                               self.channels))).sum(1)
        return enc  # (B, K, C)


class EncHead(nn.Module):
    """ref enc_head.py:11-146 (use_se_loss, no laterals)."""

    def __init__(self, in_ch, channels, num_codes, num_classes,
                 in_index=3):
        super().__init__()
        self.in_index = in_index
        self.bottleneck = ConvModule(in_ch, channels, 3, padding=1)

        class EncModule(nn.Module):
            def __init__(self):
                super().__init__()
                self.encoding_project = ConvModule(channels, channels, 1)
                self.encoding = nn.Sequential(
                    Encoding(channels, num_codes),
                    nn.BatchNorm1d(num_codes), nn.ReLU(inplace=True))
                self.fc = nn.Sequential(nn.Linear(channels, channels),
                                        nn.Sigmoid())

            def forward(self, x):
                enc = self.encoding(self.encoding_project(x)).mean(dim=1)
                gamma = self.fc(enc)
                y = gamma.view(x.size(0), x.size(1), 1, 1)
                return enc, F.relu(x + x * y)

        self.enc_module = EncModule()
        self.se_layer = nn.Linear(channels, num_classes)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        feat = self.bottleneck(inputs[self.in_index])
        enc_feat, out = self.enc_module(feat)
        return self.conv_seg(out), self.se_layer(enc_feat)


class ACM(nn.Module):
    """ref apc_head.py:10-106."""

    def __init__(self, pool_scale, in_ch, channels, fusion=True):
        super().__init__()
        self.pool_scale, self.channels, self.fusion = pool_scale, \
            channels, fusion
        self.pooled_redu_conv = ConvModule(in_ch, channels, 1)
        self.input_redu_conv = ConvModule(in_ch, channels, 1)
        self.global_info = ConvModule(channels, channels, 1)
        self.gla = nn.Conv2d(channels, pool_scale ** 2, 1)
        self.residual_conv = ConvModule(channels, channels, 1)
        if fusion:
            self.fusion_conv = ConvModule(channels, channels, 1)

    def forward(self, x):
        s = self.pool_scale
        pooled = self.pooled_redu_conv(F.adaptive_avg_pool2d(x, s))
        xr = self.input_redu_conv(x)
        n = x.size(0)
        pooled = pooled.view(n, self.channels, -1).permute(0, 2, 1)
        gi = F.interpolate(
            self.global_info(F.adaptive_avg_pool2d(xr, 1)),
            size=xr.shape[2:], mode='nearest')
        aff = torch.sigmoid(self.gla(xr + gi).permute(0, 2, 3, 1).reshape(
            n, -1, s ** 2))
        z = torch.matmul(aff, pooled).permute(0, 2, 1).reshape(
            n, self.channels, *xr.shape[2:])
        z = F.relu(self.residual_conv(z) + xr)
        if self.fusion:
            z = self.fusion_conv(z)
        return z


class APCHead(nn.Module):
    """ref apc_head.py:109-158."""

    def __init__(self, in_ch, channels, num_classes,
                 pool_scales=(1, 2, 3), in_index=0):
        super().__init__()
        self.in_index = in_index
        self.acm_modules = nn.ModuleList(
            [ACM(s, in_ch, channels) for s in pool_scales])
        self.bottleneck = ConvModule(
            in_ch + len(pool_scales) * channels, channels, 3, padding=1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        x = inputs[self.in_index]
        outs = [x] + [m(x) for m in self.acm_modules]
        return self.conv_seg(self.bottleneck(torch.cat(outs, dim=1)))


class DCM(nn.Module):
    """ref dm_head.py:10-88."""

    def __init__(self, filter_size, in_ch, channels, fusion=False):
        super().__init__()
        self.filter_size, self.channels, self.fusion = filter_size, \
            channels, fusion
        self.filter_gen_conv = nn.Conv2d(in_ch, channels, 1)
        self.input_redu_conv = ConvModule(in_ch, channels, 1)
        self.norm = nn.BatchNorm2d(channels)
        if fusion:
            self.fusion_conv = ConvModule(channels, channels, 1)

    def forward(self, x):
        s = self.filter_size
        filt = self.filter_gen_conv(F.adaptive_avg_pool2d(x, s))
        feat = self.input_redu_conv(x)
        b, c, h, w = feat.shape
        feat = feat.view(1, b * c, h, w)
        filt = filt.view(b * c, 1, s, s)
        pad = (s - 1) // 2
        p2d = (pad, pad, pad, pad) if (s - 1) % 2 == 0 else \
            (pad + 1, pad, pad + 1, pad)
        out = F.conv2d(F.pad(feat, p2d), filt, groups=b * c).view(
            b, c, h, w)
        out = F.relu(self.norm(out))
        if self.fusion:
            out = self.fusion_conv(out)
        return out


class DMHead(nn.Module):
    """ref dm_head.py:91-139 (fusion=False default)."""

    def __init__(self, in_ch, channels, num_classes,
                 filter_sizes=(1, 3, 5), in_index=0):
        super().__init__()
        self.in_index = in_index
        self.dcm_modules = nn.ModuleList(
            [DCM(s, in_ch, channels) for s in filter_sizes])
        self.bottleneck = ConvModule(
            in_ch + len(filter_sizes) * channels, channels, 3, padding=1)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        x = inputs[self.in_index]
        outs = [x] + [m(x) for m in self.dcm_modules]
        return self.conv_seg(self.bottleneck(torch.cat(outs, dim=1)))


class _PPMConcat(nn.ModuleList):
    """ref ann_head.py:10-29."""

    def __init__(self, pool_scales=(1, 3, 6, 8)):
        super().__init__([nn.AdaptiveAvgPool2d(s) for s in pool_scales])

    def forward(self, feats):
        outs = [p(feats).view(*feats.shape[:2], -1) for p in self]
        return torch.cat(outs, dim=2)


class _ANNSelfAttention(nn.Module):
    """ref ann_head.py:32-77 + self_attention_block.py:131-159: normed
    ConvModule key/query projections, bare value/out convs, key/value
    pyramid-pooled AFTER projection, matmul_norm."""

    def __init__(self, low_in, high_in, channels, out_channels,
                 share_key_query=False, key_pool_scales=(1, 3, 6, 8)):
        super().__init__()
        self.channels = channels
        self.share = share_key_query
        self.key_project = ConvModule(low_in, channels, 1)
        if not share_key_query:
            self.query_project = ConvModule(high_in, channels, 1)
        self.value_project = nn.Conv2d(low_in, channels, 1)
        self.out_project = nn.Conv2d(channels, out_channels, 1)
        self.key_psp = _PPMConcat(key_pool_scales)

    def forward(self, query_feats, key_feats):
        b = query_feats.size(0)
        qp = self.key_project if self.share else self.query_project
        query = qp(query_feats).reshape(b, self.channels, -1).permute(
            0, 2, 1)
        key = self.key_psp(self.key_project(key_feats))
        value = self.key_psp(self.value_project(key_feats)).permute(
            0, 2, 1)
        sim = torch.matmul(query, key) * self.channels ** -0.5
        sim = F.softmax(sim, dim=-1)
        ctx = torch.matmul(sim, value).permute(0, 2, 1).reshape(
            b, -1, *query_feats.shape[2:])
        return self.out_project(ctx)


class AFNB(nn.Module):
    """ref ann_head.py:80-131."""

    def __init__(self, low_in, high_in, channels, out_channels):
        super().__init__()
        self.stages = nn.ModuleList([_ANNSelfAttention(
            low_in, high_in, channels, out_channels)])
        self.bottleneck = ConvModule(out_channels + high_in, out_channels,
                                     1, act=False)

    def forward(self, low, high):
        ctx = self.stages[0](high, low)
        return self.bottleneck(torch.cat([ctx, high], dim=1))


class APNB(nn.Module):
    """ref ann_head.py:134-181."""

    def __init__(self, in_ch, channels, out_channels):
        super().__init__()
        self.stages = nn.ModuleList([_ANNSelfAttention(
            in_ch, in_ch, channels, out_channels, share_key_query=True)])
        self.bottleneck = ConvModule(2 * in_ch, out_channels, 1)

    def forward(self, feats):
        ctx = self.stages[0](feats, feats)
        return self.bottleneck(torch.cat([ctx, feats], dim=1))


class ANNHead(nn.Module):
    """ref ann_head.py:184-245."""

    def __init__(self, in_channels, channels, project_channels,
                 num_classes, in_index=(0, 1)):
        super().__init__()
        self.in_index = in_index
        low_in, high_in = in_channels
        self.fusion = AFNB(low_in, high_in, project_channels, high_in)
        self.bottleneck = ConvModule(high_in, channels, 3, padding=1)
        self.context = APNB(channels, project_channels, channels)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, inputs):
        low, high = (inputs[i] for i in self.in_index)
        out = self.fusion(low, high)
        out = self.bottleneck(out)
        out = self.context(out)
        return self.conv_seg(out)
